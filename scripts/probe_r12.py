#!/usr/bin/env python
"""Round-2b probe: two-stage VPU stage-1 for n1 in {16, 32} with the
inter-stage twiddle applied as trace-time SCALAR multiplies per
(k_f, m_B) slice — probe_r11's array-broadcast twiddle (rank-4 constant
reshaped to (f,B,1,1)) crashed Mosaic (HTTP 500) at n=2048/4096.

Variants per n: A = current production kernel; V = VPU stage-1 chain.

Run: nohup setsid python scripts/probe_r12.py > /tmp/probe_r12.out 2>&1 &
"""
from __future__ import annotations

import functools
import math
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

S1_FACTORS = {16: (4, 4), 32: (4, 8)}


def _vpu2(xr, xi, S, f1, f2, sign):
    """Two-stage DFT of size S=f1*f2 over the leading axis of [S, bt, n2],
    natural output order, twiddles folded as scalar constants."""
    bt, n2 = xr.shape[1], xr.shape[2]
    B = f2
    # stage 1: contract major factor f1; input index s = j1*B + m
    xr = xr.reshape(f1, B, bt, n2)
    xi = xi.reshape(f1, B, bt, n2)
    br, bi = pf._stage_dft(xr, xi, f1, 0, sign, 1.0)  # [k1, B, bt, n2]
    # twiddle w_S^(k1*m) as scalar constants per (k1, m) slice
    rows_r, rows_i = [], []
    for k1 in range(f1):
        cols_r, cols_i = [], []
        for m in range(B):
            c = math.cos(sign * 2.0 * math.pi * k1 * m / S)
            s = math.sin(sign * 2.0 * math.pi * k1 * m / S)
            vr = br[k1, m]
            vi = bi[k1, m]
            if k1 * m == 0:
                tr, ti = vr, vi
            else:
                tr = c * vr - s * vi
                ti = c * vi + s * vr
            cols_r.append(tr[None])
            cols_i.append(ti[None])
        rows_r.append(jnp.concatenate(cols_r, 0)[None])
        rows_i.append(jnp.concatenate(cols_i, 0)[None])
    cr = jnp.concatenate(rows_r, 0)  # [f1, B, bt, n2] = [k1, m, bt, n2]
    ci = jnp.concatenate(rows_i, 0)
    # stage 2: contract m (dim 1) -> [k2, k1, bt, n2]; flatten = k2*f1+k1
    dr, di = pf._stage_dft(cr, ci, f2, 1, sign, 1.0)
    return dr.reshape(S, bt, n2), di.reshape(S, bt, n2)


def _kernel_vpu2(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                 f1, f2):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)  # [n1, bt, n2]
    ai = xi_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)

    br, bi = _vpu2(ar, ai, n1, f1, f2, sign)  # [k1, bt, n2] natural

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_vpu2(re, im, sign=-1):
    rows, n = re.shape
    bt = pf._row_tile(n)
    n1, n2 = n // 128, 128
    f1, f2 = S1_FACTORS[n1]
    kern = functools.partial(_kernel_vpu2, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, f1=f1, f2=f2)
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
    shapes = [(1024, 2048), (4096, 4096), (1024, 4096)]
    for rows, n in shapes:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        fA = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        fV = jax.jit(rows_vpu2)
        oA = fA(re, im)
        _ = float(jnp.sum(oA[0][:2, :2]))
        tA = _device_time(fA, (re, im))
        print(f"{rows}x{n}: A={tA*1e3:.3f} ms", flush=True)
        try:
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
            print(f"          V={tV*1e3:.3f} ms (compile {comp:.0f}s)  "
                  f"relL2={rel:.2e}", flush=True)
        except Exception as e:
            print(f"          V FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    main()
