#!/usr/bin/env python
"""Round-2b hardware probes: headline row kernel (n=4096 x 4096 C2C fwd).

Goal: find the ~11 us/step between the dot floor (16.3 us: 512 f32 MAC/pt
at 6 bf16 passes) and the measured 27.5 us/step, and probe a *split-once*
bf16x3 scheme (weights pre-split at trace time, ONE hi/lo split per stage
input) — unlike the round-1 bf16x3 which split per dot (3-4x split cost,
9 passes with Gauss).

Variants:
  A_current      baseline fft_batched_split           (expect ~0.885 ms)
  B_notw_noT     dots only, transposed HBM write      (dot floor check)
  C_tw_noT       dots + twiddle, transposed write     (A - C = transpose)
  D_b3_gauss     split-once bf16x3: realcat32-b3 + Gauss128-b3 (1536 pass-MACs/pt)
  E_b3_naive     split-once bf16x3: realcat32-b3 + naive-4dot-b3 (1920)
  F_b4_gauss     split-once bf16x4 Gauss (adds lo.lo term; ~f32 accuracy)

Run detached:  nohup setsid python scripts/probe_r6.py > /tmp/probe_r6.out 2>&1 &
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


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _kernel_diag(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                 twiddle):
    """Classic two-factor kernel, no output transpose (writes [n, bt]
    blocks); twiddle optional."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)
    br, bi = pf._cdot_realcat(n1, sign, ar, ai, 1, ((1,), (1,)))
    if twiddle:
        twr, twi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, None, :] - bi * twi[:, None, :]
        ci = br * twi[:, None, :] + bi * twr[:, None, :]
    else:
        cr, ci = br, bi
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))
    or_ref[:] = dr.reshape(n, bt)
    oi_ref[:] = di.reshape(n, bt)


def rows_diag(re, im, sign=-1, *, twiddle=True):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(_kernel_diag, n=n, n1=n1, n2=n2, sign=sign,
                             twiddle=twiddle)
    in_spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((n, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[in_spec, in_spec], out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((n, rows), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def _kernel_b3(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
               stage2, passes):
    """Split-once bf16 classic kernel.

    Weights: f32 tables generated in-register then hi/lo split (constants,
    trace-time shaped); data: ONE hi/lo split per stage input tensor.
    Each real matmul = `passes` bf16 MXU passes (3: drop lo.lo; 4: exact
    to the hi+lo representation, ~2^-18 relative).
    """
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)
    ai = xi_ref[:].reshape(bt, n1, n2)

    def d(w, x, dims):
        return jax.lax.dot_general(w, x, (dims, ((), ())),
                                   preferred_element_type=jnp.float32)

    def mm(whl, xhl, dims):
        (wh, wl), (xh, xl) = whl, xhl
        r = d(wh, xh, dims) + d(wh, xl, dims) + d(wl, xh, dims)
        if passes == 4:
            r = r + d(wl, xl, dims)
        return r

    # ---- stage 1: realcat32, one split of xcat ----
    w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
    wbig = jnp.concatenate(
        [jnp.concatenate([w1r, -w1i], axis=1),
         jnp.concatenate([w1i, w1r], axis=1)], axis=0)
    xcat = jnp.concatenate([ar, ai], axis=1)
    res = mm(_split(wbig), _split(xcat), ((1,), (1,)))  # [2n1, bt, n2]
    br, bi = res[:n1], res[n1:]

    # ---- twiddle ----
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    # ---- stage 2 over m2 (lane dim) ----
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
    dims = ((1,), (2,))
    if stage2 == "gauss":
        # 3 dots, 3 splits (xr+xi, xi, xr)
        m1 = mm(_split(w2r), _split(cr + ci), dims)
        m2 = mm(_split(w2r + w2i), _split(ci), dims)
        m3 = mm(_split(w2i - w2r), _split(cr), dims)
        dr, di = m1 - m2, m1 + m3
    else:  # naive 4-dot, 2 splits
        crh = _split(cr)
        cih = _split(ci)
        wr2 = _split(w2r)
        wi2 = _split(w2i)
        dr = mm(wr2, crh, dims) - mm(wi2, cih, dims)
        di = mm(wr2, cih, dims) + mm(wi2, crh, dims)

    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_b3(re, im, sign=-1, *, stage2="gauss", passes=3):
    rows, n = re.shape
    bt = 128
    n1, n2 = n // 128, 128
    kern = functools.partial(_kernel_b3, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, stage2=stage2, passes=passes)
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
        "A_current": (jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1)), False),
        "B_notw_noT": (jax.jit(functools.partial(rows_diag, twiddle=False)), None),
        "C_tw_noT": (jax.jit(functools.partial(rows_diag, twiddle=True)), None),
        "D_b3_gauss": (jax.jit(functools.partial(rows_b3, stage2="gauss", passes=3)), True),
        "E_b3_naive": (jax.jit(functools.partial(rows_b3, stage2="naive", passes=3)), True),
        "F_b4_gauss": (jax.jit(functools.partial(rows_b3, stage2="gauss", passes=4)), True),
    }

    ref_r = ref_i = None
    for name, (fn, check) in variants.items():
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
        if name == "A_current":
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
