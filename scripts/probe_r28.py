#!/usr/bin/env python
"""Probe: (1) interleaved repeats of headline chain (4,4,4) vs (4,8,2)
(r27 saw 0.640 vs 0.633 — confirm above noise); (2) balanced row tile 64
(more grid steps -> possibly better VPU/DMA pipelining); (3) balanced
2048 retry with radix-2^2 chains (classic 0.167 was tied pre-radix).

Run: nohup python scripts/probe_r28.py > /tmp/probe_r28.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


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
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)

    fns = {}
    for factors in [(4, 4, 4), (4, 8, 2)]:
        pf._BALANCED[4096] = (64, 64, factors)
        fns[factors] = jax.jit(
            lambda a, b, _f=factors: pf.fft_batched_split(
                a, b, -1, schedule="balanced"))
        _ = fns[factors](re, im)  # compile now (cached from r27)
    pf._BALANCED[4096] = (64, 64, (4, 4, 4))

    # interleaved repeats
    for rep in range(3):
        for factors, fn in fns.items():
            row(f"4096 {factors} rep{rep}", fn, (re, im))

    # row tile 64 on the balanced kernel (default 128)
    for bt in (64, 256):
        row(f"4096 bal (4,4,4) tile {bt}",
            jax.jit(lambda a, b, _t=bt: pf.fft_batched_split(
                a, b, -1, schedule="balanced", row_tile=_t)),
            (re, im))

    # 2048 balanced retry (radix-2^2 chains): classic currently 0.167
    re2 = jax.random.normal(k0, (2048, 2048), jnp.float32)
    im2 = jax.random.normal(k1, (2048, 2048), jnp.float32)
    row("2048 classic", jax.jit(lambda a, b: pf.fft_batched_split(
        a, b, -1, schedule="classic")), (re2, im2))
    for n1, n2, factors in [(32, 64, (4, 8)), (64, 32, (4, 4, 4)),
                            (32, 64, (4, 4, 2)), (16, 128, (4, 4))]:
        pf._BALANCED[2048] = (n1, n2, factors)
        row(f"2048 bal ({n1},{n2})+{factors}",
            jax.jit(lambda a, b: pf.fft_batched_split(
                a, b, -1, schedule="balanced")), (re2, im2))
    pf._BALANCED.pop(2048, None)


if __name__ == "__main__":
    main()
