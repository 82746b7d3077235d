#!/usr/bin/env python
"""Probe r33: four-step factor pairs after the big-n1 row wins (8192 rows
0.489 -> 0.338, 16384 0.869 -> 0.770): the n2=4096 pin (probe_r17/r18)
may be stale.

Run: nohup setsid python scripts/probe_r33.py > /tmp/probe_r33.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import fourstep


def row(tag, fn, args, oracle=None):
    try:
        t0 = time.time()
        o = fn(*args)
        first = o[0] if isinstance(o, (tuple, list)) else o
        _ = float(jnp.sum(first.ravel()[:8]))
        comp = time.time() - t0
        if oracle is not None:
            got = np.asarray(o[0])[:1] + 1j * np.asarray(o[1])[:1]
            rel = np.linalg.norm(got - oracle) / np.linalg.norm(oracle)
            if rel > 5e-6:
                print(f"{tag}: WRONG rel={rel:.1e}", flush=True)
                return
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    from fft_wgpu_tpu.ops import pallas_fft as pf
    enable_persistent_compilation_cache()
    print("probe_r33 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- headline stragglers: 4096 with a tiny MXU stage 2 ----
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)
    oracle = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))
    b4096 = pf._BALANCED[4096]
    for split in [(256, 16, (4, 8, 8)), (512, 8, (8, 8, 8))]:
        pf._BALANCED[4096] = split
        fn = jax.jit(lambda a, b, _s=split: pf.fft_batched_split(
            a, b, -1, schedule="balanced"))
        print(f"compiling 4096 {split}...", flush=True)
        try:
            got = fn(re[:2], im[:2])
            g = np.asarray(got[0]) + 1j * np.asarray(got[1])
            rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
            if rel > 5e-6:
                print(f"4096 {split}: WRONG rel={rel:.1e}", flush=True)
                continue
            row(f"4096 {split}", fn, (re, im))
        except Exception as e:
            print(f"4096 {split}: FAILED {str(e)[:160]}", flush=True)
    pf._BALANCED[4096] = b4096
    del re, im

    base = fourstep.choose_factors
    cases = [
        (1 << 22, 4, [(1024, 4096), (512, 8192), (256, 16384)]),
        (1 << 21, 8, [(512, 4096), (256, 8192), (128, 16384)]),
        (1 << 23, 2, [(2048, 4096), (1024, 8192), (512, 16384)]),
    ]
    for N, batch, pairs in cases:
        re = jax.random.normal(k0, (batch, N), jnp.float32)
        im = jax.random.normal(k1, (batch, N), jnp.float32)
        z = np.asarray(re[:1]) + 1j * np.asarray(im[:1])
        oracle = np.fft.fft(z)
        for pair in pairs:
            fourstep.choose_factors = lambda n, _p=pair: _p
            # bypass the bigfft fast path for 2^21 so the four-step is
            # actually measured (batch>1 rows are four-step in prod)
            fn = jax.jit(lambda a, b, _p=pair: fourstep.fft_last_axis(
                a, b, -1))
            print(f"compiling {N} {pair}...", flush=True)
            row(f"fourstep {N}x{batch} {pair}", fn, (re, im), oracle=oracle)
        fourstep.choose_factors = base


if __name__ == "__main__":
    main()
    print("probe_r33 done", flush=True)
