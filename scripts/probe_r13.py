#!/usr/bin/env python
"""Round-2b probe: balanced-split row kernel via in-kernel transpose.

With stage-1 MXU-free (VPU butterflies, probe_r12), the remaining MXU cost
is stage-2's n2 MACs/pt — and the lane split pins n2=128 (Gauss128,
12.2 us/step at n=4096).  Transposing the tile ([bt,n] -> [n,bt], ~free
per probe_r2) puts the whole row on the SUBLANE axis where the split is
unconstrained: balanced (n1,n2) with n1 VPU-chained and n2 in {32,64}
realcat ([64,64]/[128,128] dots = full MXU rate).

W variant MXU cost: n=4096 (64,64) -> 64 MACs/pt (vs 128); n=2048 (32,64)
-> 64 (vs 128); n=1024 (32,32) -> 32 (vs 128); n=8192 (64,128) -> 128
(vs 128, but stage-1 dot removed).

Run: nohup setsid python scripts/probe_r13.py > /tmp/probe_r13.out 2>&1 &
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

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf

SPLITS = {512: (16, 32), 1024: (32, 32), 2048: (32, 64), 4096: (64, 64),
          8192: (64, 128)}
VPU_FACTORS = {16: (4, 4), 32: (4, 8), 64: (8, 8)}


def _kernel_w(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T.reshape(n1, n2, bt)  # transpose-in (~free)
    ai = xi_ref[:].T.reshape(n1, n2, bt)

    # stage 1 over the leading (major) digit: VPU butterflies
    br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, VPU_FACTORS[n1])

    # inter-factor twiddle tw[k1, m2] over the trailing batch
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]

    # stage 2: contract m2 (dim 1) -> [k2, k1, bt]; flatten natural order
    if 2 * n2 <= 128:
        dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
        if scale != 1.0:
            dr = dr * scale
            di = di * scale
    else:
        w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
        dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_w(re, im, sign=-1):
    rows, n = re.shape
    bt = 128
    n1, n2 = SPLITS[n]
    kern = functools.partial(_kernel_w, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    shapes = [(4096, 4096), (2048, 2048), (2048, 1024), (2500, 512),
              (1024, 8192)]
    for rows, n in shapes:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        fA = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        fW = jax.jit(rows_w)
        oA = fA(re, im)
        _ = float(jnp.sum(oA[0][:2, :2]))
        tA = _device_time(fA, (re, im))
        print(f"{rows}x{n}: A={tA*1e3:.3f} ms", flush=True)
        try:
            t0 = time.time()
            oW = fW(re, im)
            _ = float(jnp.sum(oW[0][:2, :2]))
            comp = time.time() - t0
            tW = _device_time(fW, (re, im))
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(oW[0], oW[1], oA[0], oA[1]))
            print(f"          W={tW*1e3:.3f} ms (compile {comp:.0f}s)  "
                  f"relL2={rel:.2e}", flush=True)
        except Exception as e:
            print(f"          W FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
