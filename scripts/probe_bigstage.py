#!/usr/bin/env python
# HISTORICAL RECORD: measured the pre-tall-layout bigfft kernel (square
# [sqrt(n), sqrt(n)] + transpose); that internal API was replaced by the
# tall-layout kernel after probe_bigv2.py, so this script no longer runs.

"""bigfft stage formulation shootout at n=2^20 rows=1.

Hypothesis: the 3.6x-over-MAC stage cost is realcat's concatenate+slice
VMEM traffic (~32 MB per stage at this size), which Gauss 3-mult avoids
at the price of [32,32]-shaped dots (rate-degraded but copy-free).

  A_realcat   current kernel (stages via _cdot_realcat)     [157 us total]
  B_gauss     stages via Gauss 3-mult [32,32] dots
  C_mixed     stage DFTs via Gauss, but with (64,16)?  no — (32,32) only

Run: nohup setsid python scripts/probe_bigstage.py > /tmp/probe_bigstage.out 2>&1 &
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
from fft_wgpu_tpu.ops import bigfft as bf
from fft_wgpu_tpu.ops import pallas_fft as pf

N = 1 << 20
N1 = N2 = 1 << 10


def _sublane_dft_gauss(xr, xi, S, sign, scale):
    """(32,32) two-level DIT with every DFT as Gauss 3-mult (no concat)."""
    a = b = 32
    rest = xr.shape[1:]
    xr = xr.reshape(a, b, *rest)
    xi = xi.reshape(a, b, *rest)
    wr, wi = pf._gen_dft(a, a, a, sign)
    br, bi = pf._cdot(wr, wr + wi, wi - wr, xr, xi, ((1,), (0,)))
    twr, twi = pf._gen_twiddle(a, b, S, sign)
    bc = (a, b) + (1,) * len(rest)
    cr = br * twr.reshape(bc) - bi * twi.reshape(bc)
    ci = br * twi.reshape(bc) + bi * twr.reshape(bc)
    w2r, w2i = pf._gen_dft(b, b, b, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    return dr.reshape(S, *rest), di.reshape(S, *rest)


def _kernel(xr_ref, xi_ref, or_ref, oi_ref, *, mode):
    ar = xr_ref[0].reshape(N1, N2)
    ai = xi_ref[0].reshape(N1, N2)
    sub = bf._sublane_dft if mode == "realcat" else _sublane_dft_gauss
    br, bi = sub(ar, ai, N1, -1, 1.0)
    cr, ci = bf._outer_twiddle(br, bi, N1, N2, N, -1)
    dr, di = sub(cr.T, ci.T, N2, -1, 1.0)
    or_ref[0] = dr.reshape(N)
    oi_ref[0] = di.reshape(N)


def build(mode):
    spec = pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(1,), in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: f(a, b))


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (1, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, N), jnp.float32)
    ref = None
    for mode in ("realcat", "gauss"):
        try:
            t0 = time.time()
            fn = build(mode)
            o = fn(re, im)
            _ = float(jnp.sum(o[0][:, :8]))
            comp = time.time() - t0
            dt = _device_time(fn, (re, im))
            msg = f"{mode}: {dt*1e6 if dt else -1:.0f} us (compile {comp:.0f}s)"
            if ref is None:
                ref = o
            else:
                rel = float(jax.jit(lambda a, b, c, d: jnp.sqrt(
                    (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
                    / (jnp.sum(c ** 2) + jnp.sum(d ** 2))))(*o, *ref))
                msg += f" rel={rel:.2e}"
            print(msg, flush=True)
        except Exception as e:
            print(f"{mode}: FAILED {type(e).__name__}: {e}"[:250], flush=True)


if __name__ == "__main__":
    main()
