#!/usr/bin/env python
"""Round-2b probes: bigfft (2^20 single-shot) sublane-chain schedules.

probe_bigablate found the two realcat32 sublane stages run ~3.5x over
their MAC model (57 us each) — rank-4 [K, 64, B, 128] operands with small
K/B blocks are the suspect.  Candidate: two-level schedules whose stages
are RANK-3 with uniform [128,128,128]-class shapes:

  b_cur    current fft_big_split (factors (8,32,32) for S=8192)
  b_6428   chain factors (64, 128): realcat64 (K=128 full rate) then
           Gauss128 over dim 1 — no rank-4 states at all
  b_3232   chain factors (32, 2, 128)? no — (32, 256): realcat32 + Gauss256
  b_12864  chain factors (128, 64): Gauss128 then realcat64

Run: nohup setsid python scripts/probe_r10.py > /tmp/probe_r10.out 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import bigfft as bf
from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

N = 1 << 20


def _kernel_sched(xr_ref, xi_ref, or_ref, oi_ref, *, n, sign, scale,
                  factors):
    S = n // 128
    ar = xr_ref[0].reshape(S, 128)
    ai = xi_ref[0].reshape(S, 128)
    br, bi = pf._dft_sublane_chain(ar, ai, S, sign, factors=factors)
    twr, twi = pf._gen_twiddle(S, 128, n, sign)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    w2r, w2i = pf._gen_dft(128, 128, 128, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[0] = dr.reshape(n)
    oi_ref[0] = di.reshape(n)


def big_sched(re, im, sign=-1, *, factors):
    rows, n = re.shape
    kern = functools.partial(_kernel_sched, n=n, sign=sign, scale=1.0,
                             factors=factors)
    spec = pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(rows,),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def main():
    enable_persistent_compilation_cache()
    re = jax.random.normal(jax.random.PRNGKey(0), (1, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, N), jnp.float32)

    variants = {
        "b_cur": (lambda a, b: bf.fft_big_split(a, b, -1), False),
        "b_6428": (functools.partial(big_sched, factors=(64, 128)), True),
        "b_32_256": (functools.partial(big_sched, factors=(32, 256)), True),
        "b_12864": (functools.partial(big_sched, factors=(128, 64)), True),
    }

    ref_r = ref_i = None
    for name, (fn, check) in variants.items():
        fn = jax.jit(fn)
        t0 = time.time()
        try:
            outs = fn(re, im)
            _ = float(jnp.sum(outs[0].ravel()[:8]))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, (re, im))
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if name == "b_cur":
            ref_r, ref_i = outs
        elif check and ref_r is not None:
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(outs[0], outs[1], ref_r, ref_i))
            msg += f"  relL2_vs_cur={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
