#!/usr/bin/env python
"""Probe r31: bigger-n1 balanced splits everywhere (follow-up to r29's
8192 (128,64) 0.489 -> 0.346 ms win — radix-2^2 made long VPU chains
cheap, so the n1<=64 pins from probe_r13/r19 are stale), plus the C2R
stage-A VPU chain (interpret-validated in tests/test_pallas.py).

Run: nohup setsid python scripts/probe_r31.py > /tmp/probe_r31.out 2>&1 &
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


def check_rows(n, split, re, im, oracle):
    pf._BALANCED[n] = split
    fn = jax.jit(lambda a, b, _s=split: pf.fft_batched_split(
        a, b, -1, schedule="balanced"))
    got = fn(re[:2], im[:2])
    g = np.asarray(got[0]) + 1j * np.asarray(got[1])
    rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
    if rel > 5e-6:
        print(f"{n} {split}: WRONG rel={rel:.1e}", flush=True)
        return None
    return fn


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r31 start", flush=True)

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- (1) C2C rows: bigger n1 ----
    cases = [
        (4096, 4096, [(128, 32, (4, 8, 4)), (128, 32, (4, 4, 8)),
                      (128, 32, (2, 8, 8))]),
        (2048, 2048, [(128, 16, (4, 8, 4)), (64, 32, (4, 8, 2))]),
        (8192, 1024, [(256, 32, (4, 8, 8))]),
        (16384, 1024, [(128, 128, (4, 8, 4)), (256, 64, (4, 8, 8))]),
    ]
    for n, rows, splits in cases:
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        oracle = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))
        base = pf._BALANCED.get(n)
        for split in splits:
            print(f"compiling {n} {split}...", flush=True)
            fn = check_rows(n, split, re, im, oracle)
            if fn is not None:
                row(f"{n} {split}", fn, (re, im))
        if base is None:
            pf._BALANCED.pop(n, None)
        else:
            pf._BALANCED[n] = base

    # ---- (2) R2C: bigger n1 ----
    r2c_cases = [
        (4096, 4096, [(128, 32, (4, 8, 4))]),
        (8192, 2048, [(128, 64, (4, 8, 4))]),
        (2048, 4096, [(128, 16, (4, 8, 4))]),
    ]
    for n, rows, splits in r2c_cases:
        x = jax.random.normal(k0, (rows, n), jnp.float32)
        want = np.fft.rfft(np.asarray(x[:2]))
        base = pf._BALANCED_R2C.get(n)
        for split in splits:
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
        pf._BALANCED_R2C[n] = base

    # ---- (3) C2R: stage-A VPU chain + bigger n1 ----
    c2r_cases = [
        (512, 4096, [(16, 32, (4, 4))]),
        (1024, 4096, [(32, 32, (4, 8))]),
        (2048, 4096, [(32, 64, (4, 8)), (128, 16, (4, 8, 4))]),
        (4096, 4096, [(64, 64, (4, 4, 4)), (64, 64, (4, 8, 2)),
                      (128, 32, (4, 8, 4))]),
        (8192, 2048, [(64, 128, (4, 4, 4)), (128, 64, (4, 8, 4))]),
    ]
    for n, rows, splits in c2r_cases:
        Xr = jax.random.normal(k0, (rows, n // 2 + 1), jnp.float32)
        Xi = jax.random.normal(k1, (rows, n // 2 + 1), jnp.float32)
        Z = np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2])
        want = np.fft.irfft(Z, n=n)
        base = pf._BALANCED_C2R.get(n)
        for split in splits:
            pf._BALANCED_C2R[n] = split
            fn = jax.jit(lambda a, b, _s=split, _n=n: pf.irfft_rows_split(
                a, b, _n, scale=1.0 / _n))
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
    print("probe_r31 done", flush=True)
