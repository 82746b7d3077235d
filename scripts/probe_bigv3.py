#!/usr/bin/env python
"""Tall bigfft chain-schedule shootout at n=2^20 rows=1 (current: 134 us
with chain (8,32,32)).  Variants swap the S=8192 sublane chain:

  a_8_32_32    current        (256 MACs/pt chain + VPU8)
  b_64_128     two proven-rank-3 stages, realcat64 + Gauss128 (640)
  c_2_4_32_32  adds-only VPU tails (256 + VPU2 + VPU4)

Run: nohup setsid python scripts/probe_bigv3.py > /tmp/probe_bigv3.out 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf

N = 1 << 20
S = N // 128


def _kernel(xr_ref, xi_ref, or_ref, oi_ref, *, factors):
    ar = xr_ref[0].reshape(S, 128)
    ai = xi_ref[0].reshape(S, 128)
    br, bi = pf._dft_sublane_chain(ar, ai, S, -1, factors=factors)
    twr, twi = pf._gen_twiddle(S, 128, N, -1)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr
    w2r, w2i = pf._gen_dft(128, 128, 128, -1)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[0] = dr.reshape(N)
    oi_ref[0] = di.reshape(N)


def build(factors):
    kern = functools.partial(_kernel, factors=tuple(factors))
    spec = pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(1,), in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: f(a, b))


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (1, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, N), jnp.float32)
    ref = None
    for name, factors in [("a_8_32_32", (8, 32, 32)),
                          ("b_64_128", (64, 128)),
                          ("c_2_4_32_32", (2, 4, 32, 32))]:
        try:
            t0 = time.time()
            fn = build(factors)
            o = fn(re, im)
            _ = float(jnp.sum(o[0][:, :8]))
            comp = time.time() - t0
            dt = _device_time(fn, (re, im))
            msg = f"{name}: {dt*1e6 if dt else -1:.0f} us (compile {comp:.0f}s)"
            if ref is None:
                ref = o
            else:
                rel = float(jax.jit(lambda a, b, c, d: jnp.sqrt(
                    (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
                    / (jnp.sum(c ** 2) + jnp.sum(d ** 2))))(*o, *ref))
                msg += f" rel={rel:.2e}"
            print(msg, flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:250], flush=True)


if __name__ == "__main__":
    main()
