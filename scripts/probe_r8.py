#!/usr/bin/env python
"""Round-2b probes: stage-1 restructure of the headline kernel.

probe_r7 facts: h2 (3 HIGHEST Gauss128 dots + full IO + swapaxes) = 18.0
us/step — DMA overlaps the MXU there; the full kernel A = 27.7 us/step,
i.e. stage-1 (realcat32: axis-1 concat of the whole 4 MB tile + one K=64
dot + slices) adds ~10 us, far above its ~2 us of MXU math.  Suspect: the
sublane-interleaving concat (axis 1 of [bt, n1, n2]) and/or a pipeline
break.  Variants (all FULL FFTs, accuracy-checked):

  k0_copy       pass-through kernel (true copy floor with this spec)
  h3_one_dot    1 HIGHEST dot only  (dot-count scaling, fixed from r7)
  h4_two_dot    2 HIGHEST dots only
  kA_current    reference (cached compile)
  k1_split2     stage1 = wL.ar + wR.ai (NO concat; 2 K=32 dots + add)
  k2_gauss_s1   stage1 = Gauss 3x[32,32] dots (pre-adds, no concat)
  k8_swapcat    stage1 on [n1, bt, n2] via swapaxes; concat on LEADING axis
                (contiguous copy, no sublane interleave), realcat dim 0

Run: nohup setsid python scripts/probe_r8.py > /tmp/probe_r8.out 2>&1 &
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


def _d(w, x, dims):
    return jax.lax.dot_general(w, x, (dims, ((), ())), precision=_PREC,
                               preferred_element_type=jnp.float32)


def _kernel_copy(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    or_ref[:] = xr_ref[:]
    oi_ref[:] = xi_ref[:]


def _kernel_ndots(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, ndots):
    bt = xr_ref.shape[0]
    cr = xr_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)
    ci = xi_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dims = ((1,), (2,))
    m1 = _d(w2r, cr + ci, dims)                      # [n2, n1, bt]
    m2 = _d(w2r + w2i, ci, dims) if ndots >= 2 else m1
    m3 = _d(w2i - w2r, cr, dims) if ndots >= 3 else m1
    or_ref[:] = (m1 - m2).reshape(n, bt).T
    oi_ref[:] = (m1 + m3).reshape(n, bt).T


def _stage2_out(cr, ci, n, n2, sign, bt, or_ref, oi_ref):
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def _twiddle(br, bi, n1, n2, n, sign):
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]
    return cr, ci


def _kernel_split2(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    """Stage 1 with no concat: [Br;Bi] = wbigL.ar + wbigR.ai."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)
    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wL = jnp.concatenate([w1r, w1i], axis=0)    # [2n1, n1] (constants)
    wR = jnp.concatenate([-w1i, w1r], axis=0)
    res = _d(wL, ar, ((1,), (1,))) + _d(wR, ai, ((1,), (1,)))
    br, bi = res[:n1], res[n1:]
    cr, ci = _twiddle(br, bi, n1, n2, n, sign)
    _stage2_out(cr, ci, n, n2, sign, bt, or_ref, oi_ref)


def _kernel_gauss_s1(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    """Stage 1 as Gauss 3x small dots (no concat)."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)
    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    br, bi = pf._cdot(w1r, w1r + w1i, w1i - w1r, ar, ai, ((1,), (1,)))
    cr, ci = _twiddle(br, bi, n1, n2, n, sign)
    _stage2_out(cr, ci, n, n2, sign, bt, or_ref, oi_ref)


def _kernel_swapcat(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
    """Stage 1 realcat with a LEADING-axis concat on [n1, bt, n2]."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)  # [n1, bt, n2]
    ai = xi_ref[:].reshape(bt, n1, n2).swapaxes(0, 1)
    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    xcat = jnp.concatenate([ar, ai], axis=0)           # [2n1, bt, n2]
    res = _d(wbig, xcat, ((1,), (0,)))                 # [2n1, bt, n2]
    br, bi = res[:n1], res[n1:]
    cr, ci = _twiddle(br, bi, n1, n2, n, sign)
    _stage2_out(cr, ci, n, n2, sign, bt, or_ref, oi_ref)


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


def main():
    enable_persistent_compilation_cache()
    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)

    variants = {
        "k0_copy": (functools.partial(_rows, _kernel_copy), False),
        "h3_one_dot": (functools.partial(_rows, _kernel_ndots, ndots=1), False),
        "h4_two_dot": (functools.partial(_rows, _kernel_ndots, ndots=2), False),
        "kA_current": (lambda a, b: pf.fft_batched_split(a, b, -1), False),
        "k1_split2": (functools.partial(_rows, _kernel_split2), True),
        "k2_gauss_s1": (functools.partial(_rows, _kernel_gauss_s1), True),
        "k8_swapcat": (functools.partial(_rows, _kernel_swapcat), True),
    }

    ref_r = ref_i = None
    for name, (fn, check) in variants.items():
        fn = jax.jit(fn)
        t0 = time.time()
        try:
            outs = fn(re, im)
            _ = float(jnp.sum(outs[0][:2, :2]))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, (re, im))
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if name == "kA_current":
            ref_r, ref_i = outs
        elif check and ref_r is not None:
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(outs[0], outs[1], ref_r, ref_i))
            msg += f"  relL2_vs_A={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
