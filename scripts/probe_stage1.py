#!/usr/bin/env python
# HISTORICAL RECORD: measured the pre-tall-layout bigfft kernel (square
# [sqrt(n), sqrt(n)] + transpose); that internal API was replaced by the
# tall-layout kernel after probe_bigv2.py, so this script no longer runs.

"""Why is the bigfft sublane stage 3.6x over the MAC model?  Variants of a
1024-point sublane DFT over [1024, 1024] (lanes wide) at n=2^20 rows=1:

  wide      current: (32,32) chain on [.., 1024 lanes] directly
  chunked   unrolled loop over 8 lane-chunks of 128 (the proven ax0 shape)
  split4d   lane split [.., 8, 128] rank-4 then the same chain

Run: nohup setsid python scripts/probe_stage1.py > /tmp/probe_stage1.out 2>&1 &
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

N = 1 << 20
N1 = 1 << 10


def _kern(xr_ref, xi_ref, or_ref, oi_ref, *, mode):
    ar = xr_ref[0].reshape(N1, N1)
    ai = xi_ref[0].reshape(N1, N1)
    if mode == "wide":
        dr, di = pf._dft_sublane_chain(ar, ai, N1, -1)
    elif mode == "chunked":
        drs, dis = [], []
        for c in range(N1 // 128):
            s = slice(c * 128, (c + 1) * 128)
            r, i = pf._dft_sublane_chain(ar[:, s], ai[:, s], N1, -1)
            drs.append(r)
            dis.append(i)
        dr = jnp.concatenate(drs, axis=1)
        di = jnp.concatenate(dis, axis=1)
    elif mode == "split4d":
        a4r = ar.reshape(N1, N1 // 128, 128)
        a4i = ai.reshape(N1, N1 // 128, 128)
        dr, di = pf._dft_sublane_chain(a4r, a4i, N1, -1)
        dr = dr.reshape(N1, N1)
        di = di.reshape(N1, N1)
    or_ref[0] = dr.reshape(N)
    oi_ref[0] = di.reshape(N)


def build(mode):
    spec = pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(_kern, mode=mode),
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
    for mode in ("wide", "chunked", "split4d"):
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
