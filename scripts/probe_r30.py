#!/usr/bin/env python
"""Probe r30: C2R stage-A VPU chain (zero-extended k1 digit) vs the
realcat stage A, at every balanced C2R size.  Mirrors the R2C stage-1
chain win (probe_r19); interpret-validated exact (vcheck in-repo).

Run: nohup setsid python scripts/probe_r30.py > /tmp/probe_r30.out 2>&1 &
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
        _ = float(jnp.sum(o.ravel()[:8]))
        comp = time.time() - t0
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    cases = [
        (512, 4096, [(16, 32), (16, 32, (4, 4))]),
        (1024, 4096, [(32, 32), (32, 32, (4, 8))]),
        (2048, 4096, [(32, 64), (32, 64, (4, 8))]),
        (4096, 4096, [(64, 64), (64, 64, (4, 4, 4)), (64, 64, (4, 8, 2))]),
        (8192, 2048, [(64, 128), (64, 128, (4, 4, 4))]),
    ]
    for n, rows, splits in cases:
        Xr = jax.random.normal(k0, (rows, n // 2 + 1), jnp.float32)
        Xi = jax.random.normal(k1, (rows, n // 2 + 1), jnp.float32)
        Z = np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2])
        want = np.fft.irfft(Z, n=n)
        base = pf._BALANCED_C2R.get(n)
        for split in splits:
            pf._BALANCED_C2R[n] = split
            fn = jax.jit(lambda a, b, _s=split, _n=n: pf.irfft_rows_split(
                a, b, _n, scale=1.0 / _n))
            got = np.asarray(fn(Xr[:2], Xi[:2]))
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            if rel > 5e-6:
                print(f"C2R {n} {split}: WRONG rel={rel:.1e}", flush=True)
                continue
            row(f"C2R {n}x{rows} {split}", fn, (Xr, Xi))
        pf._BALANCED_C2R[n] = base


if __name__ == "__main__":
    main()
    print("probe_r30 done", flush=True)
