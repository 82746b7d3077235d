#!/usr/bin/env python
"""Round-2b probes: VPU-butterfly stage-1 for small first factors.

The row kernel's stage-1 realcat runs at K-fill (2*n1)/128: n=512 -> K=8
(1/16 rate), 1024 -> K=16, 2048 -> K=32.  Candidate: transpose n1 to the
leading axis (cheap sublane swap) and run the small-factor VPU butterfly
chain (pallas_fft._dft_sublane_chain) instead of the tiny dot.

Variants per n: A = current kernel; V = VPU stage-1 chain.

Run: nohup setsid python scripts/probe_r11.py > /tmp/probe_r11.out 2>&1 &
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
from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

# stage-1 chain factors per n1 (VPU {2,4,8} + realcat where sensible)
S1_FACTORS = {4: (4,), 8: (8,), 16: (4, 4), 32: (4, 8)}


def _kernel_vpu1(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                 factors):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)  # [n1, bt, n2]
    ai = xi_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)

    br, bi = pf._dft_sublane_chain(ar, ai, n1, sign, factors=factors)
    # [k1, bt, n2] natural order — same layout the realcat dot produces

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_vpu1(re, im, sign=-1):
    rows, n = re.shape
    bt = pf._row_tile(n)
    n1, n2 = n // 128, 128
    kern = functools.partial(_kernel_vpu1, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, factors=S1_FACTORS[n1])
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def main():
    enable_persistent_compilation_cache()
    shapes = [(2500, 512), (4096, 512), (2048, 1024), (1024, 2048),
              (4096, 4096)]
    for rows, n in shapes:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        fA = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        fV = jax.jit(rows_vpu1)
        try:
            oA = fA(re, im)
            _ = float(jnp.sum(oA[0][:2, :2]))
            tA = _device_time(fA, (re, im))
            t0 = time.time()
            oV = fV(re, im)
            _ = float(jnp.sum(oV[0][:2, :2]))
            comp = time.time() - t0
            tV = _device_time(fV, (re, im))
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(oV[0], oV[1], oA[0], oA[1]))
            print(f"{rows}x{n}: A={tA*1e3:.3f} ms  V={tV*1e3:.3f} ms "
                  f"(compile {comp:.0f}s)  relL2={rel:.2e}", flush=True)
        except Exception as e:
            print(f"{rows}x{n}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
