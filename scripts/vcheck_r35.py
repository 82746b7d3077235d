#!/usr/bin/env python
"""vcheck r35: probe_r33's 4096 (256,16)+(4,8,8) candidate vs the pinned
(64,64)+(4,8,2) THROUGH PRODUCTION ROUTING (fft_batched_split), oracle +
interleaved timing (A/B/A/B) to kill run-to-run drift.

Run: nohup setsid python scripts/vcheck_r35.py > /tmp/vcheck_r35.out 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("vcheck_r35 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    n, rows = 4096, 4096
    re = jax.random.normal(k0, (rows, n), jnp.float32)
    im = jax.random.normal(k1, (rows, n), jnp.float32)
    z = np.asarray(re[:2]) + 1j * np.asarray(im[:2])
    oracle = np.fft.fft(z)

    pins = {"pinned(64,64)+(4,8,2)": (64, 64, (4, 8, 2)),
            "cand(256,16)+(4,8,8)": (256, 16, (4, 8, 8)),
            "cand(128,32)+(4,8,4)": (128, 32, (4, 8, 4))}
    fns = {}
    for tag, pin in pins.items():
        pf._BALANCED[n] = pin  # read at trace time by _fft_batched_core
        fn = jax.jit(lambda a, b, _p=pin: pf.fft_batched_split(a, b, -1))
        got = fn(re[:2], im[:2])
        g = np.asarray(got[0]) + 1j * np.asarray(got[1])
        rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
        print(f"{tag}: rel {rel:.1e}", flush=True)
        assert rel < 1e-5, tag
        fns[tag] = fn
    # interleaved timing, 3 rounds each
    for rnd in range(3):
        for tag, fn in fns.items():
            pf._BALANCED[n] = pins[tag]
            t = _device_time(fn, (re, im))
            print(f"round{rnd} {tag}: {t*1e3:.3f} ms", flush=True)
    print("vcheck_r35 done", flush=True)


if __name__ == "__main__":
    main()
