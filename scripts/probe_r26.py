#!/usr/bin/env python
"""Re-measure configs affected by the radix-2^2 VPU butterflies
(a9b45a3) and the f=4 real radix stage (9d63d5d): headline 4096 rows,
2-D 4096^2, 16384 DIT chain, balanced R2C/C2R at 4096/8192/2048, 2^20.

Run: nohup setsid python scripts/probe_r26.py > /tmp/probe_r26.out 2>&1 &
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

    # headline + 16384 chain + 2^20 single-shot
    for n, b in [(4096, 4096), (16384, 1024), (1 << 20, 16)]:
        p = get_plan(n, "auto")
        re = jax.random.normal(k0, (b, n), jnp.float32)
        im = jax.random.normal(k1, (b, n), jnp.float32)
        row(f"C2C {n} x {b}",
            jax.jit(lambda a, c, _p=p: _p._execute_split(a, c, -1, None)),
            (re, im))

    # 2-D 4096^2
    from fft_wgpu_tpu.ops.nd import fftn_split
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)
    row("2-D 4096^2 C2C",
        jax.jit(lambda a, b: fftn_split(a, b, (-2, -1), -1, None)),
        (re, im))

    # balanced real transforms (f=4 real radix change)
    from fft_wgpu_tpu.ops import pallas_fft as pf
    for n, b in [(2048, 4096), (4096, 4096), (8192, 2048)]:
        x = jax.random.normal(k0, (b, n), jnp.float32)
        row(f"r2c {n} x {b}", jax.jit(lambda a: pf._rfft_rows_core(a)), (x,))
        Xr = jax.random.normal(k0, (b, n // 2 + 1), jnp.float32)
        Xi = jax.random.normal(k1, (b, n // 2 + 1), jnp.float32)
        row(f"c2r {n} x {b}",
            jax.jit(lambda a, c, _n=n: pf._irfft_rows_core(a, c, _n, 1.0 / _n)),
            (Xr, Xi))


if __name__ == "__main__":
    main()
