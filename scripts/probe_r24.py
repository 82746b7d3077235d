#!/usr/bin/env python
"""Probe: effect of the radix-2^2 f=4/f=8 VPU butterflies (+ the new
16384 chain schedule) on every production kernel that runs VPU chains.
Baselines (old butterflies): headline 0.655, rfft4096 0.656, irfft4096
0.885, 16384 rows 0.913 (new sched, old bflies), 2^20 0.116, 2-D 1.282.

Run: nohup setsid python scripts/probe_r24.py > /tmp/probe_r24.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import bigfft


def row(tag, fn, args, check=None):
    try:
        t0 = time.time()
        o = fn(*args)
        first = o[0] if isinstance(o, (tuple, list)) else o
        _ = float(jnp.sum(first.ravel()[:8]))
        comp = time.time() - t0
        extra = ""
        if check is not None:
            extra = f", rel {check(o):.2e}"
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s{extra})",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:180]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # headline 4096 balanced
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)
    ref = None

    def chk_c2c(o):
        r = np.fft.fft(np.asarray(re) + 1j * np.asarray(im), axis=-1)
        return float(np.sqrt(((np.asarray(o[0]) - r.real) ** 2
                              + (np.asarray(o[1]) - r.imag) ** 2).sum()
                             / (abs(r) ** 2).sum()))

    row("4096 balanced (new bflies)",
        jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                  schedule="balanced")),
        (re, im), chk_c2c)

    # ax0 kernel (fastest 4096 form; used by ND/four-step)
    row("4096 ax0 (new bflies)",
        jax.jit(lambda a, b: pf.fft_axis0_split(a.T, b.T, -1, None)),
        (re, im))

    # rfft/irfft 4096
    x = jax.random.normal(k0, (4096, 4096), jnp.float32)
    row("rfft 4096 balanced (new bflies)",
        jax.jit(lambda a: pf._rfft_rows_core(a)), (x,))
    Xr = jax.random.normal(k0, (4096, 2049), jnp.float32)
    Xi = jax.random.normal(k1, (4096, 2049), jnp.float32)
    row("irfft 4096 balanced (new bflies)",
        jax.jit(lambda a, b: pf._irfft_rows_core(a, b, 4096, 1.0 / 4096)),
        (Xr, Xi))

    # 16384 rows DIT (new schedule + new bflies)
    re16 = jax.random.normal(k0, (1024, 16384), jnp.float32)
    im16 = jax.random.normal(k1, (1024, 16384), jnp.float32)
    row("16384 rows dit (new sched+bflies)",
        jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, schedule="dit")),
        (re16, im16))

    # bigfft 2^20 and 2^21
    for e in (20, 21):
        n = 1 << e
        reb = jax.random.normal(k0, (1, n), jnp.float32)
        imb = jax.random.normal(k1, (1, n), jnp.float32)
        row(f"2^{e} bigfft (new bflies)",
            jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1)),
            (reb, imb))

    # 2-D 4096^2
    from fft_wgpu_tpu.ops.nd import fftn_split
    row("2-D 4096^2 (new bflies)",
        jax.jit(lambda a, b: fftn_split(a, b, (-2, -1), -1, None)),
        (re, im))


if __name__ == "__main__":
    main()
