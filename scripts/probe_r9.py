#!/usr/bin/env python
"""Round-2b probes: pass-count and layout attacks on the headline kernel.

Facts so far (probe_r6-r8): copy floor 12.75 us/step; Mosaic dots are
{bf16 1-pass, fp32 6-pass} only; MXU time is K-fill-limited (K=64 -> half
rate, K=32 -> quarter); in-kernel f32<->bf16 data casts are catastrophic;
every factorization bottoms at ~20.4 us/step of MXU at 6-pass f32.

  m1_wsplit_hi   W pre-split to CONSTANT bf16 (hi,lo), data f32,
                 precision=HIGHEST on the mixed dots.  If Mosaic lowers
                 mixed bf16xf32 fp32-contract by splitting only the f32
                 side, each real matmul = 2x2=4 passes instead of 6 with
                 ~2^-17 W fidelity -> expect ~0.66 ms @ ~5e-6.  If it
                 promotes the lhs to f32 we get ~1.2 ms @ ~1e-7 (dead).
  m2_concat      concat(ar, ai) axis=1 + write halves (isolates concat)
  m3_stacked     input/output as ONE [bt, 2, n] array: realcat32 operand
                 comes from a FREE sublane regroup (no concat), halves
                 the DMA count.  HIGHEST dots (structure-only win).
  m4_stacked_ws  m3 + m1 combined (target ~0.56 ms)
  m5_stage1      stage-1 only (realcat32 + twiddle, no stage 2)

Run: nohup setsid python scripts/probe_r9.py > /tmp/probe_r9.out 2>&1 &
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

N, B = 4096, 4096
_PREC = jax.lax.Precision.HIGHEST


def _wsplit(w):
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _d(w, x, dims, prec=_PREC):
    return jax.lax.dot_general(w, x, (dims, ((), ())), precision=prec,
                               preferred_element_type=jnp.float32)


def _d_ws(w, x, dims, prec=_PREC):
    """Real matmul with constant-pre-split bf16 weights, f32 data."""
    hi, lo = _wsplit(w)
    return _d(hi, x, dims, prec) + _d(lo, x, dims, prec)


def _kernel_ws(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, prec):
    """Classic kernel with W-pre-split mixed dots everywhere."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)

    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    xcat = jnp.concatenate([ar, ai], axis=1)
    res = _d_ws(wbig, xcat, ((1,), (1,)), prec)
    br, bi = res[:n1], res[n1:]

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dims = ((1,), (2,))
    m1 = _d_ws(w2r, cr + ci, dims, prec)
    m2 = _d_ws(w2r + w2i, ci, dims, prec)
    m3 = _d_ws(w2i - w2r, cr, dims, prec)
    dr, di = m1 - m2, m1 + m3
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def _kernel_concat(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)
    xcat = jnp.concatenate([ar, ai], axis=1)
    or_ref[:] = xcat[:, :n1].reshape(bt, n)
    oi_ref[:] = xcat[:, n1:].reshape(bt, n)


def _kernel_stacked(x_ref, o_ref, *, n, n1, n2, sign, wsplit, prec):
    """[bt, 2, n] stacked re/im: realcat operand via free sublane regroup."""
    bt = x_ref.shape[0]
    xcat = x_ref[:].reshape(bt, 2, n1, n2).reshape(bt, 2 * n1, n2)

    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    dd = _d_ws if wsplit else _d
    res = dd(wbig, xcat, ((1,), (1,)), prec)   # [2n1, bt, n2]
    br, bi = res[:n1], res[n1:]

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dims = ((1,), (2,))
    m1 = dd(w2r, cr + ci, dims, prec)
    m2 = dd(w2r + w2i, ci, dims, prec)
    m3 = dd(w2i - w2r, cr, dims, prec)
    dr, di = m1 - m2, m1 + m3
    o_ref[:, 0, :] = dr.reshape(n, bt).T
    o_ref[:, 1, :] = di.reshape(n, bt).T


def _kernel_stage1(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)
    br, bi = pf._cdot_realcat(n1, sign, ar, ai, 1, ((1,), (1,)))
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]
    or_ref[:] = cr.reshape(n1, bt, n2).swapaxes(0, 1).reshape(bt, n)
    oi_ref[:] = ci.reshape(n1, bt, n2).swapaxes(0, 1).reshape(bt, n)


def _rows(kern_fn, re, im, **kw):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(kern_fn, n=n, n1=n1, n2=n2, sign=-1, **kw)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def _rows_stacked(x, **kw):
    rows, _, n = x.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(_kernel_stacked, n=n, n1=n1, n2=n2, sign=-1, **kw)
    spec = pl.BlockSpec((bt, 2, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 2, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(x)


def main():
    enable_persistent_compilation_cache()
    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)
    xs = jnp.stack([re, im], axis=1)  # [B, 2, N] for the stacked variants

    ref = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    ref_r, ref_i = ref(re, im)
    _ = float(jnp.sum(ref_r[:2, :2]))

    def relcheck(outs):
        return float(jax.jit(
            lambda orr, oi, rr, ri: jnp.sqrt(
                (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
        )(outs[0], outs[1], ref_r, ref_i))

    variants = {
        "m1_wsplit_hi": (lambda: jax.jit(
            functools.partial(_rows, _kernel_ws, prec=_PREC)), (re, im), True),
        "m2_concat": (lambda: jax.jit(
            functools.partial(_rows, _kernel_concat)), (re, im), False),
        "m5_stage1": (lambda: jax.jit(
            functools.partial(_rows, _kernel_stage1)), (re, im), False),
        "m3_stacked": (lambda: jax.jit(
            functools.partial(_rows_stacked, wsplit=False, prec=_PREC)),
            (xs,), "stacked"),
        "m4_stacked_ws": (lambda: jax.jit(
            functools.partial(_rows_stacked, wsplit=True, prec=_PREC)),
            (xs,), "stacked"),
    }

    for name, (mk, args, check) in variants.items():
        fn = mk()
        t0 = time.time()
        try:
            outs = fn(*args)
            first = outs[0] if isinstance(outs, (tuple, list)) else outs
            _ = float(jnp.sum(first.ravel()[:8]))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, args)
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if check == "stacked":
            rel = relcheck((outs[:, 0, :], outs[:, 1, :]))
            msg += f"  relL2_vs_ref={rel:.2e}"
        elif check:
            rel = relcheck(outs)
            msg += f"  relL2_vs_ref={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
