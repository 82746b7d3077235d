#!/usr/bin/env python
"""TPU confirmation of the probe_r31 pins through PRODUCTION routing:
C2C 8192/16384 (balanced 256-n1 chains), R2C 8192, C2R 512..8192 chains.

Run: nohup setsid python scripts/vcheck_r31.py > /tmp/vcheck_r31.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def timed(tag, fn, args):
    t0 = time.time()
    o = fn(*args)
    first = o[0] if isinstance(o, (tuple, list)) else o
    _ = float(jnp.sum(first.ravel()[:8]))
    t = _device_time(fn, args)
    print(f"{tag}: {t*1e3:.3f} ms (compile {time.time()-t0:.0f}s)", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    for n, rows in [(8192, 1024), (16384, 1024)]:
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        want = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))
        fwd = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        inv = jax.jit(lambda a, b, _n=n: pf.fft_batched_split(a, b, +1, 1.0 / _n))
        got = fwd(re[:2], im[:2])
        g = np.asarray(got[0]) + 1j * np.asarray(got[1])
        rel = np.linalg.norm(g - want) / np.linalg.norm(want)
        rr, ri = inv(*fwd(re[:2], im[:2]))
        rt = float(jnp.linalg.norm(rr - re[:2]) / jnp.linalg.norm(re[:2]))
        print(f"C2C {n}: fwd rel {rel:.2e}, roundtrip {rt:.2e}", flush=True)
        assert rel < 5e-6 and rt < 5e-6
        timed(f"C2C {n}x{rows}", fwd, (re, im))

    for n, rows in [(8192, 2048), (4096, 4096)]:
        x = jax.random.normal(k0, (rows, n), jnp.float32)
        want = np.fft.rfft(np.asarray(x[:2]))
        fn = jax.jit(lambda a: pf.rfft_rows_split(a, None))
        got = fn(x[:2])
        g = np.asarray(got[0]) + 1j * np.asarray(got[1])
        rel = np.linalg.norm(g - want) / np.linalg.norm(want)
        print(f"R2C {n}: rel {rel:.2e}", flush=True)
        assert rel < 5e-6
        timed(f"R2C {n}x{rows}", fn, (x,))

    for n, rows in [(512, 4096), (1024, 4096), (2048, 4096),
                    (4096, 4096), (8192, 2048)]:
        Xr = jax.random.normal(k0, (rows, n // 2 + 1), jnp.float32)
        Xi = jax.random.normal(k1, (rows, n // 2 + 1), jnp.float32)
        Z = np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2])
        want = np.fft.irfft(Z, n=n)
        fn = jax.jit(lambda a, b, _n=n: pf.irfft_rows_split(
            a, b, _n, scale=1.0 / _n))
        got = np.asarray(fn(Xr[:2], Xi[:2]))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        print(f"C2R {n}: rel {rel:.2e}", flush=True)
        assert rel < 5e-6
        timed(f"C2R {n}x{rows}", fn, (Xr, Xi))


if __name__ == "__main__":
    main()
    print("vcheck_r31 done", flush=True)
