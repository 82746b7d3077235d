#!/usr/bin/env python
"""Probe r32: extend the big-n1 wins to 16384 real transforms (classic
kernels today: rfft 0.955, irfft 1.227) + two C2C stragglers.

Run: nohup setsid python scripts/probe_r32.py > /tmp/probe_r32.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r32 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- C2C stragglers ----
    for n, rows, splits in [
        (16384, 1024, [(512, 32, (8, 8, 8)), (256, 64, (4, 4, 4, 4))]),
        (8192, 1024, [(512, 16, (8, 8, 8))]),
        (1024, 2048, [(64, 16, (4, 4, 4))]),
    ]:
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        oracle = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))
        base = pf._BALANCED.get(n)
        for split in splits:
            pf._BALANCED[n] = split
            fn = jax.jit(lambda a, b, _s=split: pf.fft_batched_split(
                a, b, -1, schedule="balanced"))
            print(f"compiling {n} {split}...", flush=True)
            try:
                got = fn(re[:2], im[:2])
                g = np.asarray(got[0]) + 1j * np.asarray(got[1])
                rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
                if rel > 5e-6:
                    print(f"{n} {split}: WRONG rel={rel:.1e}", flush=True)
                    continue
                row(f"{n} {split}", fn, (re, im))
            except Exception as e:
                print(f"{n} {split}: FAILED {str(e)[:160]}", flush=True)
        if base is None:
            pf._BALANCED.pop(n, None)
        else:
            pf._BALANCED[n] = base

    # ---- R2C 16384 ----
    n, rows = 16384, 1024
    x = jax.random.normal(k0, (rows, n), jnp.float32)
    want = np.fft.rfft(np.asarray(x[:2]))
    base = pf._BALANCED_R2C.get(n)
    for split in [(256, 64, (4, 8, 8)), (128, 128, (4, 8, 4))]:
        pf._BALANCED_R2C[n] = split
        fn = jax.jit(lambda a, _s=split: pf.rfft_rows_split(a, None))
        print(f"compiling R2C {n} {split}...", flush=True)
        try:
            got = fn(x[:2])
            g = np.asarray(got[0]) + 1j * np.asarray(got[1])
            rel = np.linalg.norm(g - want) / np.linalg.norm(want)
            if rel > 5e-6:
                print(f"R2C {n} {split}: WRONG rel={rel:.1e}", flush=True)
                continue
            row(f"R2C {n}x{rows} {split}", fn, (x,))
        except Exception as e:
            print(f"R2C {n} {split}: FAILED {str(e)[:160]}", flush=True)
    if base is None:
        pf._BALANCED_R2C.pop(n, None)
    else:
        pf._BALANCED_R2C[n] = base

    # ---- C2R 16384 ----
    Xr = jax.random.normal(k0, (rows, n // 2 + 1), jnp.float32)
    Xi = jax.random.normal(k1, (rows, n // 2 + 1), jnp.float32)
    Z = np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2])
    want = np.fft.irfft(Z, n=n)
    base = pf._BALANCED_C2R.get(n)
    for split in [(256, 64, (4, 8, 8)), (128, 128, (4, 8, 4))]:
        pf._BALANCED_C2R[n] = split
        fn = jax.jit(lambda a, b, _s=split: pf.irfft_rows_split(
            a, b, n, scale=1.0 / n))
        print(f"compiling C2R {n} {split}...", flush=True)
        try:
            got = np.asarray(fn(Xr[:2], Xi[:2]))
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            if rel > 5e-6:
                print(f"C2R {n} {split}: WRONG rel={rel:.1e}", flush=True)
                continue
            row(f"C2R {n}x{rows} {split}", fn, (Xr, Xi))
        except Exception as e:
            print(f"C2R {n} {split}: FAILED {str(e)[:160]}", flush=True)
    if base is None:
        pf._BALANCED_C2R.pop(n, None)
    else:
        pf._BALANCED_C2R[n] = base


if __name__ == "__main__":
    main()
    print("probe_r32 done", flush=True)
