#!/usr/bin/env python
"""Probe r29: weak-row attacks.
(1) 8192 rows: n1=128 VPU chain balanced splits (128,64) — the current
    (64,128) leaves stage 2 as Gauss128; flipping puts a realcat64 there.
(2) C2R 4096: (32,128)/(128,32) splits vs pinned (64,64).
(3) bigfft chain variants at 2^20 (S=8192) and 2^21 (S=16384).

Run: nohup setsid python scripts/probe_r29.py > /tmp/probe_r29.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import bigfft as bf


def row(tag, fn, args, oracle=None):
    try:
        t0 = time.time()
        o = fn(*args)
        first = o[0] if isinstance(o, (tuple, list)) else o
        _ = float(jnp.sum(first.ravel()[:8]))
        comp = time.time() - t0
        if oracle is not None:
            got = np.asarray(o[0]) + 1j * np.asarray(o[1]) if isinstance(o, tuple) else np.asarray(o)
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
    enable_persistent_compilation_cache()
    print("probe_r29 start", flush=True)

    # ---- (1) 8192 rows balanced splits ----
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    re = jax.random.normal(k0, (1024, 8192), jnp.float32)
    im = jax.random.normal(k1, (1024, 8192), jnp.float32)
    xh = np.asarray(re[:2]) + 1j * np.asarray(im[:2])
    oracle = np.fft.fft(xh)

    base = pf._BALANCED.get(8192)
    for split in [base, (128, 64, (4, 4, 8)), (128, 64, (4, 8, 4)),
                  (128, 64, (8, 4, 4))]:
        pf._BALANCED[8192] = split
        fn = jax.jit(lambda a, b, _s=split: pf.fft_batched_split(
            a, b, -1, schedule="balanced"))
        print(f"compiling 8192 {split}...", flush=True)
        got = fn(re[:2], im[:2])
        g = np.asarray(got[0]) + 1j * np.asarray(got[1])
        rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
        if rel > 5e-6:
            print(f"8192 {split}: WRONG rel={rel:.1e}", flush=True)
            continue
        row(f"8192 {split}", fn, (re, im))
    pf._BALANCED[8192] = base

    # ---- (2) C2R 4096 splits ----
    n = 4096
    Xr = jax.random.normal(k0, (4096, n // 2 + 1), jnp.float32)
    Xi = jax.random.normal(k1, (4096, n // 2 + 1), jnp.float32)
    cbase = pf._BALANCED_C2R.get(n)
    for split in [cbase, (32, 128), (128, 32)]:
        pf._BALANCED_C2R[n] = split
        fn = jax.jit(lambda a, b, _s=split: pf.irfft_rows_split(
            a, b, n, scale=1.0 / n))
        Z = np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2])
        want = np.fft.irfft(Z, n=n)
        got = np.asarray(fn(Xr[:2], Xi[:2]))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        if rel > 5e-6:
            print(f"C2R 4096 {split}: WRONG rel={rel:.1e}", flush=True)
            continue
        row(f"C2R 4096 {split}", fn, (Xr, Xi))
    pf._BALANCED_C2R[n] = cbase

    # ---- (3) bigfft chains ----
    for N, chains in [(1 << 20, [None, (4, 8, 8, 32), (4, 4, 4, 2, 64),
                                 (2, 8, 8, 64)]),
                      (1 << 21, [None, (4, 4, 8, 128), (4, 4, 4, 4, 64),
                                 (2, 4, 8, 8, 32)])]:
        S = N // 128
        rb = jax.random.normal(k0, (1, N), jnp.float32)
        ib = jax.random.normal(k1, (1, N), jnp.float32)
        zo = np.fft.fft(np.asarray(rb[0]) + 1j * np.asarray(ib[0]))[None]
        sbase = bf._CHAIN_SCHEDULE.get(S)
        for ch in chains:
            if ch is None:
                if sbase is None:
                    tag = f"big {N} default"
                else:
                    tag = f"big {N} {sbase} (pinned)"
                bf._CHAIN_SCHEDULE.pop(S, None)
                if sbase is not None:
                    bf._CHAIN_SCHEDULE[S] = sbase
            else:
                bf._CHAIN_SCHEDULE[S] = ch
                tag = f"big {N} {ch}"
            fn = jax.jit(lambda a, b, _c=ch: bf.fft_big_split(a, b, -1))
            row(tag, fn, (rb, ib), oracle=zo)
        if sbase is None:
            bf._CHAIN_SCHEDULE.pop(S, None)
        else:
            bf._CHAIN_SCHEDULE[S] = sbase


if __name__ == "__main__":
    main()
    print("probe_r29 done", flush=True)
