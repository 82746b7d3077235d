#!/usr/bin/env python
# HISTORICAL RECORD: measured the pre-tall-layout bigfft kernel (square
# [sqrt(n), sqrt(n)] + transpose); that internal API was replaced by the
# tall-layout kernel after probe_bigv2.py, so this script no longer runs.

"""Ablate the bigfft kernel at n=2^20 rows=1 to find where 157 us goes
(ideal: DMA 20.5 us + MXU ~32 us).  Pieces are switched off by flag; the
math is wrong for ablated variants — timing only.

Run: nohup setsid python scripts/probe_bigablate.py > /tmp/probe_bigablate.out 2>&1 &
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

N = 1 << 20


def _kernel_ablate(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                   do_s1, do_tw, do_tr, do_s2):
    ar = xr_ref[0].reshape(n1, n2)
    ai = xi_ref[0].reshape(n1, n2)
    if do_s1:
        ar, ai = bf._sublane_dft(ar, ai, n1, sign, 1.0)
    if do_tw:
        ar, ai = bf._outer_twiddle(ar, ai, n1, n2, n, sign)
    if do_tr:
        ar, ai = ar.T, ai.T
    if do_s2:
        ar, ai = bf._sublane_dft(ar, ai, ar.shape[0], sign, scale)
    or_ref[0] = ar.reshape(n)
    oi_ref[0] = ai.reshape(n)


def build(**flags):
    n1, n2 = bf._choose_split(N)
    kern = functools.partial(_kernel_ablate, n=N, n1=n1, n2=n2, sign=-1,
                             scale=1.0, **flags)
    spec = pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(1,), in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: f(a, b))


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (1, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, N), jnp.float32)
    cases = [
        ("copy_only", dict(do_s1=False, do_tw=False, do_tr=False, do_s2=False)),
        ("transpose_only", dict(do_s1=False, do_tw=False, do_tr=True, do_s2=False)),
        ("twiddle_only", dict(do_s1=False, do_tw=True, do_tr=False, do_s2=False)),
        ("stage1_only", dict(do_s1=True, do_tw=False, do_tr=False, do_s2=False)),
        ("stage2_only", dict(do_s1=False, do_tw=False, do_tr=False, do_s2=True)),
        ("full", dict(do_s1=True, do_tw=True, do_tr=True, do_s2=True)),
    ]
    for name, flags in cases:
        try:
            t0 = time.time()
            fn = build(**flags)
            _ = float(jnp.sum(fn(re, im)[0][:, :8]))
            comp = time.time() - t0
            dt = _device_time(fn, (re, im))
            print(f"{name}: {dt*1e6 if dt else -1:.0f} us (compile {comp:.0f}s)",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}"[:250], flush=True)


if __name__ == "__main__":
    main()
