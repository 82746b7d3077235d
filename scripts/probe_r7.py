#!/usr/bin/env python
"""Round-2b probes: why do HIGHEST f32 dots run at 1.67x the 6-pass model?

probe_r6 showed the headline kernel's time is ~entirely dots (twiddle +
output transpose free), and in-kernel bf16 splits are hopeless.  This
probe pins down the dot cost model:

  h1_default   full classic kernel, DEFAULT precision      (pass scaling)
  h2_gauss1    ONLY one Gauss128 triple (3 dots, 402 MF/step)
  h3_one_dot   ONLY one real dot (134 MF/step)
  h4_two_dot   ONLY two real dots (268 MF/step)
     -> marginal per-dot rate + fixed overhead from the 1/2/3-dot line
  h5_high      precision=HIGH (record exact Mosaic error)
  h6_algx3     DotAlgorithmPreset BF16_BF16_F32_X3 (record exact error)
  h7_wsplit    classic kernel, W pre-split to CONSTANT bf16 (hi,lo) pairs,
               data stays f32, DEFAULT precision: if Mosaic runs mixed
               bf16xf32 dots by splitting only the f32 side, each complex
               stage costs 4 bf16 passes instead of 6 with NO runtime
               tensor splits.  Accuracy tells the story: ~5e-6 => 2-pass
               mixed dots; ~1e-3 => rhs got rounded to bf16 (1 pass).

Run: nohup setsid python scripts/probe_r7.py > /tmp/probe_r7.out 2>&1 &
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


def _kernel_dots(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, ndots):
    """ndots in {1,2,3}: subset of the Gauss stage-2 dots, transposed write."""
    bt = xr_ref.shape[0]
    cr = xr_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)  # [n1, bt, n2]
    ci = xi_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)
    w2r, w2i = pf._gen_dft(n2, n2, n2, -1)
    d = lambda w, x: jax.lax.dot_general(
        w, x, ((((1,), (2,))), ((), ())), precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    m1 = d(w2r, cr + ci)
    if ndots >= 2:
        m2 = d(w2r + w2i, ci)
    else:
        m2 = ci.swapaxes(0, 2)  # shape [n2, n1, bt]-compatible filler
    if ndots >= 3:
        m3 = d(w2i - w2r, cr)
    else:
        m3 = cr.swapaxes(0, 2)
    or_ref[:] = (m1 - m2).reshape(n, bt)
    oi_ref[:] = (m1 + m3).reshape(n, bt)


def rows_dots(re, im, *, ndots):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(_kernel_dots, n=n, n1=n1, n2=n2, ndots=ndots)
    in_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[in_spec, in_spec], out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, rows), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def _kernel_classic_prec(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                         prec):
    """Classic two-factor kernel with a chosen dot `prec` everywhere."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)

    d = lambda w, x, dims: jax.lax.dot_general(
        w, x, (dims, ((), ())), precision=prec,
        preferred_element_type=jnp.float32)

    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    xcat = jnp.concatenate([ar, ai], axis=1)
    res = d(wbig, xcat, ((1,), (1,)))
    br, bi = res[:n1], res[n1:]

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dims = ((1,), (2,))
    m1 = d(w2r, cr + ci, dims)
    m2 = d(w2r + w2i, ci, dims)
    m3 = d(w2i - w2r, cr, dims)
    dr, di = m1 - m2, m1 + m3
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def _kernel_wsplit(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    """Classic kernel, weights as CONSTANT bf16 (hi, lo) pairs, f32 data:
    each real matmul = Whi.x + Wlo.x mixed bf16xf32 dots."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)

    def wsplit(w):
        hi = w.astype(jnp.bfloat16)
        lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def d2(w, x, dims):
        hi, lo = wsplit(w)
        dd = lambda a, b: jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
        return dd(hi, x) + dd(lo, x)

    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    xcat = jnp.concatenate([ar, ai], axis=1)
    res = d2(wbig, xcat, ((1,), (1,)))
    br, bi = res[:n1], res[n1:]

    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dims = ((1,), (2,))
    m1 = d2(w2r, cr + ci, dims)
    m2 = d2(w2r + w2i, ci, dims)
    m3 = d2(w2i - w2r, cr, dims)
    dr, di = m1 - m2, m1 + m3
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def _rows_call(kern_builder, re, im, **kw):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(kern_builder, n=n, n1=n1, n2=n2, sign=-1, **kw)
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
    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)

    try:
        from jax.lax import DotAlgorithmPreset
        algx3 = DotAlgorithmPreset.BF16_BF16_F32_X3
    except Exception:
        algx3 = "BF16_BF16_F32_X3"

    variants = {
        "h3_one_dot": (lambda a, b: rows_dots(a, b, ndots=1), False),
        "h4_two_dot": (lambda a, b: rows_dots(a, b, ndots=2), False),
        "h2_gauss1": (lambda a, b: rows_dots(a, b, ndots=3), False),
        "h1_default": (lambda a, b: _rows_call(
            _kernel_classic_prec, a, b, prec=jax.lax.Precision.DEFAULT), True),
        "h5_high": (lambda a, b: _rows_call(
            _kernel_classic_prec, a, b, prec=jax.lax.Precision.HIGH), True),
        "h6_algx3": (lambda a, b: _rows_call(
            _kernel_classic_prec, a, b, prec=algx3), True),
        "h7_wsplit": (lambda a, b: _rows_call(_kernel_wsplit, a, b), True),
    }

    ref = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    ref_r, ref_i = ref(re, im)
    _ = float(jnp.sum(ref_r[:2, :2]))

    for name, (fn, check) in variants.items():
        fn = jax.jit(fn)
        t0 = time.time()
        try:
            outs = fn(re, im)
            _ = float(jnp.sum(outs[0][:2, :2]))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, (re, im))
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if check:
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(outs[0], outs[1], ref_r, ref_i))
            msg += f"  relL2_vs_ref={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
