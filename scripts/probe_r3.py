#!/usr/bin/env python
"""Round-2 probes, part 2: dot algorithms + overhead ablations on the
current row kernel (kernel A schedule: realcat32 stage1 + Gauss128 stage2).

  X3   kernel A with dot algorithm BF16_BF16_F32_X3 (3 MXU passes vs 6)
  X6   kernel A with BF16_BF16_F32_X6 (should match HIGHEST in time+bits)
  NT   kernel A without the output transpose (rows_t path, timing only)
  NW   kernel A without the inter-factor twiddle (wrong math, timing only)

Run: nohup setsid python scripts/probe_r3.py > /tmp/probe_r3.out 2>&1 &
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

N, B = 4096, 4096


def make_row_kernel(algo, *, twiddle=True):
    """Kernel-A schedule with a configurable dot precision/algorithm."""

    def dg(w, x, dims):
        return jax.lax.dot_general(w, x, (dims, ((), ())), precision=algo,
                                   preferred_element_type=jnp.float32)

    def cdot(wr, wi, xr, xi, dims):
        m1 = dg(wr, xr + xi, dims)
        m2 = dg(wr + wi, xi, dims)
        m3 = dg(wi - wr, xr, dims)
        return m1 - m2, m1 + m3

    def realcat(n1, sign, xr, xi, cat_axis, dims):
        wr, wi = pf._gen_dft(n1, n1, n1, sign)
        wbig = jnp.concatenate(
            [jnp.concatenate([wr, -wi], axis=1),
             jnp.concatenate([wi, wr], axis=1)], axis=0)
        xcat = jnp.concatenate([xr, xi], axis=cat_axis)
        res = dg(wbig, xcat, dims)
        return res[:n1], res[n1:]

    def kernel(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign):
        bt = xr_ref.shape[0]
        ar = xr_ref[:].reshape(bt, n1, n2)
        ai = xi_ref[:].reshape(bt, n1, n2)
        br, bi = realcat(n1, sign, ar, ai, 1, ((1,), (1,)))
        if twiddle:
            twr, twi = pf._gen_twiddle(n1, n2, n, sign)
            twr = twr[:, None, :]
            twi = twi[:, None, :]
            cr = br * twr - bi * twi
            ci = br * twi + bi * twr
        else:
            cr, ci = br, bi
        w2r, w2i = pf._gen_dft(n2, n2, n2, sign)
        dr, di = cdot(w2r, w2i, cr, ci, ((1,), (2,)))
        or_ref[:] = dr.reshape(n, bt).T
        oi_ref[:] = di.reshape(n, bt).T

    def run(re, im, sign=-1):
        rows, n = re.shape
        bt = 128
        n1, n2 = n // 128, 128
        kern = functools.partial(kernel, n=n, n1=n1, n2=n2, sign=sign)
        spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(pl.cdiv(rows, bt),),
            in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(re, im)

    return run


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)

    P = jax.lax.DotAlgorithmPreset
    variants = {}
    variants["A_highest"] = jax.jit(
        make_row_kernel(jax.lax.Precision.HIGHEST))
    for name, algo in [("X3", P.BF16_BF16_F32_X3), ("X6", P.BF16_BF16_F32_X6),
                       ("X9", P.BF16_BF16_F32_X9)]:
        variants[name] = jax.jit(make_row_kernel(algo))
    variants["NT_rows_t"] = jax.jit(
        lambda a, b: pf.fft_rows_transposed_split(
            a.reshape(1, B, N), b.reshape(1, B, N), -1))
    variants["NW_no_twiddle"] = jax.jit(
        make_row_kernel(jax.lax.Precision.HIGHEST, twiddle=False))

    ref_r = ref_i = None
    for name, fn in variants.items():
        t0 = time.time()
        try:
            outs = fn(re, im)
            _ = float(jnp.sum(outs[0].ravel()[:8]))
        except Exception as e:
            print(f"{name}: FAILED: {type(e).__name__}: {e}"[:300], flush=True)
            continue
        compile_s = time.time() - t0
        dt = _device_time(fn, (re, im))
        msg = f"{name}: {dt*1e3 if dt else -1:.3f} ms  (compile {compile_s:.0f}s)"
        if name == "A_highest":
            ref_r, ref_i = outs
        elif ref_r is not None and name in ("X3", "X6", "X9"):
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(outs[0], outs[1], ref_r, ref_i))
            msg += f"  relL2_vs_A={rel:.2e}"
        print(msg, flush=True)


if __name__ == "__main__":
    main()
