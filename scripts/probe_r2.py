#!/usr/bin/env python
"""Round-2 hardware probes: candidate row-kernel schedules at the headline
config (n=4096 x batch 4096, fp32 C2C forward).

Variants (per-step cost model: bf16-pass-MACs/pt; copy floor ~12.7 us/step):
  A  current row kernel            (realcat32 + Gauss128 HIGHEST, 512 f32MAC/pt)
  B  current ax0 sublane kernel    (realcat64^2 HIGHEST, 512, no transposes)
  C  v2 row: inT + realcat64^2     (512 + 2 transposes -> isolates inT cost)
  D  v2 row: inT + Gauss64^2 HIGHEST (384)
  E  v2 row: inT + Gauss64^2 bf16x3  (pre-split weights, 3 passes: 576 bf16MAC)
  F  v2 row: inT + Gauss64^2 bf16x4  (4 passes: 768 bf16MAC)
  G  ax0 sublane with Gauss64^2 HIGHEST (384, no transposes — ND-path upside)

Accuracy: E/F compared against A (itself ~3e-7 vs numpy).
Run detached:  nohup setsid python scripts/probe_r2.py > /tmp/probe_r2.out 2>&1 &
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

N, B = 4096, 4096
_PREC = jax.lax.Precision.HIGHEST


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dg_mode(w, x, dims, mode):
    """One real matmul in the requested precision mode."""
    if mode == "highest":
        return jax.lax.dot_general(w, x, (dims, ((), ())), precision=_PREC,
                                   preferred_element_type=jnp.float32)
    wh, wl = _split_bf16(w)
    xh, xl = _split_bf16(x)
    d = lambda a, b: jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
    r = d(wh, xh) + d(wh, xl) + d(wl, xh)
    if mode == "bf16x4":
        r = r + d(wl, xl)
    return r


def _gauss_mode(wr, wi, xr, xi, dims, mode):
    m1 = _dg_mode(wr, xr + xi, dims, mode)
    m2 = _dg_mode(wr + wi, xi, dims, mode)
    m3 = _dg_mode(wi - wr, xr, dims, mode)
    return m1 - m2, m1 + m3


def _kernel_v2(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
               stage_mode, prec):
    """Row FFT with both factors on the SUBLANE axis: transpose the
    [bt, n] tile to [n, bt], sublane-split to [n1, n2, bt], run a balanced
    two-stage DFT (each stage a full-rate [64,64]-class dot), transpose
    back.  Costs 2 VMEM transposes but drops the 128-point lane-dim DFT
    (Gauss 3x128 MACs/pt) for balanced n1+n2."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    ai = xi_ref[:].T.reshape(n1, n2, bt)

    # stage 1: contract m1 (dim 0) -> [k1, n2, bt]
    if stage_mode == "realcat":
        br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
    else:
        w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
        br, bi = _gauss_mode(w1r, w1i, ar, ai, ((1,), (0,)), prec)

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]

    # stage 2: contract m2 (dim 1) -> [k2, k1, bt]
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
    if stage_mode == "realcat":
        wbig = jnp.concatenate(
            [jnp.concatenate([w2r, -w2i], axis=1),
             jnp.concatenate([w2i, w2r], axis=1)], axis=0)
        xcat = jnp.concatenate([cr, ci], axis=1)
        res = jax.lax.dot_general(wbig, xcat, ((((1,), (1,))), ((), ())),
                                  precision=_PREC,
                                  preferred_element_type=jnp.float32)
        dr, di = res[:n2], res[n2:]
    else:
        dr, di = _gauss_mode(w2r, w2i, cr, ci, ((1,), (1,)), prec)

    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_v2(re, im, sign=-1, *, stage_mode="gauss", prec="highest"):
    rows, n = re.shape
    bt = 128
    e = n.bit_length() - 1
    n1 = 1 << (e // 2)
    n2 = n // n1
    kern = functools.partial(_kernel_v2, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, stage_mode=stage_mode, prec=prec)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


# ---- ax0 sublane kernel with Gauss stages (variant G) ----
def _kernel_ax0_gauss(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    ar = xr_ref[0].reshape(n1, n2, 128)
    ai = xi_ref[0].reshape(n1, n2, 128)
    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    br, bi = _gauss_mode(w1r, w1i, ar, ai, ((1,), (0,)), "highest")
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dr, di = _gauss_mode(w2r, w2i, cr, ci, ((1,), (1,)), "highest")
    or_ref[0] = dr.reshape(n, 128)
    oi_ref[0] = di.reshape(n, 128)


def ax0_gauss(re, im, sign=-1):
    n, m = re.shape
    e = n.bit_length() - 1
    n1 = 1 << (e // 2)
    n2 = n // n1
    kern = functools.partial(_kernel_ax0_gauss, n=n, n1=n1, n2=n2, sign=sign)
    re3 = re.reshape(1, n, m)
    im3 = im.reshape(1, n, m)
    spec = pl.BlockSpec((1, n, 128), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        kern, grid=(1, pl.cdiv(m, 128)),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, n, m), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re3, im3)
    return outr[0], outi[0]


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)

    variants = {
        "A_row_current": jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1)),
        "B_ax0_current": jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1)),
        "C_v2_realcat": jax.jit(functools.partial(rows_v2, stage_mode="realcat")),
        "D_v2_gauss_f32": jax.jit(functools.partial(rows_v2, stage_mode="gauss", prec="highest")),
        "E_v2_gauss_bf16x3": jax.jit(functools.partial(rows_v2, stage_mode="gauss", prec="bf16x3")),
        "F_v2_gauss_bf16x4": jax.jit(functools.partial(rows_v2, stage_mode="gauss", prec="bf16x4")),
        "G_ax0_gauss": jax.jit(ax0_gauss),
    }

    ref_r = ref_i = None
    for name, fn in variants.items():
        t0 = time.time()
        try:
            outs = fn(re, im)
            _ = float(jnp.sum(outs[0][:2, :2]))
        except Exception as e:
            print(f"{name}: FAILED compile/run: {type(e).__name__}: {e}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, (re, im))
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if name == "A_row_current":
            ref_r, ref_i = outs
        elif ref_r is not None and name not in ("B_ax0_current", "G_ax0_gauss"):
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(outs[0], outs[1], ref_r, ref_i))
            msg += f"  relL2_vs_A={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
