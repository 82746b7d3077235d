#!/usr/bin/env python
"""Measurement pass for BENCHMARKS.md refresh after the radix-2^2
butterflies: small C2C rows, four-step sizes, 3-D single-chip, and the
classic-path R2C/C2R at 16384 (recording, no balanced entry exists).

Run: nohup setsid python scripts/probe_r25.py > /tmp/probe_r25.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.plan.plan import get_plan


def row(tag, fn, args):
    try:
        t0 = time.time()
        o = fn(*args)
        first = o[0] if isinstance(o, (tuple, list)) else o
        _ = float(jnp.sum(first.ravel()[:8]))
        comp = time.time() - t0
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:180]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    for n, b in [(512, 2500), (1024, 2048), (2048, 2048), (8192, 1024),
                 (1 << 21, 8), (1 << 22, 4)]:
        p = get_plan(n, "auto")
        re = jax.random.normal(k0, (b, n), jnp.float32)
        im = jax.random.normal(k1, (b, n), jnp.float32)
        row(f"C2C {n} x {b}",
            jax.jit(lambda a, c, _p=p: _p._execute_split(a, c, -1, None)),
            (re, im))

    # 3-D single chip (BASELINE's distributed config, local slice regime)
    from fft_wgpu_tpu.ops.nd import fftn_split
    for s in (256, 512):
        re = jax.random.normal(k0, (s, s, s), jnp.float32)
        im = jax.random.normal(k1, (s, s, s), jnp.float32)
        row(f"3-D {s}^3 C2C",
            jax.jit(lambda a, b: fftn_split(a, b, (-3, -2, -1), -1, None)),
            (re, im))

    # classic-path real transforms at 16384 (for the record)
    from fft_wgpu_tpu.ops import pallas_fft as pf
    x = jax.random.normal(k0, (1024, 16384), jnp.float32)
    row("r2c 16384 x 1024 classic", jax.jit(lambda a: pf._rfft_rows_core(a)),
        (x,))
    Xr = jax.random.normal(k0, (1024, 8193), jnp.float32)
    Xi = jax.random.normal(k1, (1024, 8193), jnp.float32)
    row("c2r 16384 x 1024 classic",
        jax.jit(lambda a, b: pf._irfft_rows_core(a, b, 16384, 1.0 / 16384)),
        (Xr, Xi))


if __name__ == "__main__":
    main()
