#!/usr/bin/env python
"""Probe r38: chain inter-stage twiddles as merged-digit TABLE multiplies.

The balanced kernels apply inter-stage chain twiddles as f*B per-(k,m)
sliced scalar multiplies + concats per layer (the rank-4 (f,B,1,1) array
broadcast crashed Mosaic, probe_r11).  But the OUTER twiddle's rank-3
[n1, n2, 1] broadcast works fine, and _dft_sublane_chain's rank-3 tables
work fine — so merging the digit dims to one leading axis and multiplying
by a 2-D-generated table (TW_MODE="table" in pallas_fft) should compile
AND collapse each twiddle layer from ~f*B small vreg ops into 6 whole-
array ops.  Numerics pre-validated in interpret mode (3e-7 all kernels).

Measures scalar vs table through the production entry points.

Run: nohup setsid python scripts/probe_r38.py > /tmp/probe_r38.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r38 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def c2c(n, rows):
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        oracle = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))

        def chk(out):
            g = np.asarray(out[0]) + 1j * np.asarray(out[1])
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        fn = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        return f"c2c {n}x{rows}", fn, (re, im), chk

    def ax0(n, lanes):
        re = jax.random.normal(k0, (n, lanes), jnp.float32)
        im = jax.random.normal(k1, (n, lanes), jnp.float32)
        oracle = np.fft.fft(np.asarray(re[:, :2]) + 1j * np.asarray(im[:, :2]),
                            axis=0)

        def chk(out):
            g = np.asarray(out[0]) + 1j * np.asarray(out[1])
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        fn = jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1))
        # ax0 slices lanes, not rows: custom check path
        def chk2(out):
            return chk(out)
        return f"ax0 {n}x{lanes}", fn, (re, im), None  # timing only (oracle via c2c forms)

    def r2c(n, rows):
        x = jax.random.normal(k0, (rows, n), jnp.float32)
        oracle = np.fft.rfft(np.asarray(x[:2]))

        def chk(out):
            g = np.asarray(out[0]) + 1j * np.asarray(out[1])
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        fn = jax.jit(lambda a: pf.rfft_rows_split(a))
        return f"r2c {n}x{rows}", fn, (x,), chk

    def c2r(n, rows):
        z = np.fft.rfft(np.asarray(
            jax.random.normal(k0, (rows, n), jnp.float32)))
        Xr = jnp.asarray(z.real.astype(np.float32))
        Xi = jnp.asarray(z.imag.astype(np.float32))
        oracle = np.fft.irfft(z[:2], n)

        def chk(out):
            g = np.asarray(out)
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        fn = jax.jit(lambda a, b: pf.irfft_rows_split(a, b, n, 1.0 / n))
        return f"c2r {n}x{rows}", fn, (Xr, Xi), chk

    # Case CONSTRUCTORS: rebuilt per mode so each mode gets fresh jits
    # (TW_MODE is read at trace time; reusing a jitted fn across modes
    # would silently re-time the first mode's cached executable).
    builders = [
        lambda: c2c(4096, 4096),
        lambda: c2c(8192, 1024),
        lambda: c2c(16384, 1024),
        lambda: c2c(2048, 2048),
        lambda: ax0(4096, 4096),
        lambda: r2c(4096, 4096),
        lambda: r2c(8192, 2048),
        lambda: c2r(4096, 4096),
        lambda: c2r(8192, 2048),
    ]

    results = {}
    for mode in ("table", "scalar"):
        pf.TW_MODE = mode
        for build in builders:
            tag, fn, args, chk = build()
            try:
                t0 = time.time()
                if chk is not None:
                    out = fn(*[a[:2] if a.shape[0] > 4 else a[:, :2]
                               for a in args])
                    rel = chk(out)
                    if rel > 5e-6:
                        print(f"{mode} {tag}: WRONG rel={rel:.1e}", flush=True)
                        continue
                else:
                    rel = float("nan")
                t = _device_time(fn, args)
                results[(mode, tag)] = t
                print(f"{mode} {tag}: {t*1e3:.3f} ms rel={rel:.1e} "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"{mode} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    print("\nsummary (table vs scalar):", flush=True)
    for (mode, tag), t in sorted(results.items()):
        if mode == "table":
            ts = results.get(("scalar", tag))
            if ts:
                print(f"  {tag}: table {t*1e3:.3f} vs scalar {ts*1e3:.3f} "
                      f"({ts/t:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r38 done", flush=True)
