#!/usr/bin/env python
"""Probe r39: chain inter-stage twiddles as PASSED-IN merged-digit tables.

probe_r38 measured in-kernel-GENERATED tables (iota + cos/sin + floor-mod)
losing 0.90-0.99x to trace-time scalar slices — consistent with the
transcendental polynomial cost (~2.2us/step at 4096), not the multiply
structure.  This probe removes generation entirely: host-f64 tables ride
in as one [n1, 2L] kernel operand (constant BlockSpec across the grid)
and each layer is a single [S,1] x [S, rest-flat] rank-2 broadcast
multiply (TW_MODE="input" in pallas_fft).  If input == scalar, the
twiddle layers are already free and the chain butterflies themselves are
the remaining VPU cost.

Run: nohup setsid python scripts/probe_r39.py > /tmp/probe_r39.out 2>&1 &
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
    print("probe_r39 start", flush=True)
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

    builders = [
        lambda: c2c(4096, 4096),
        lambda: c2c(8192, 1024),
        lambda: c2c(16384, 1024),
        lambda: c2c(2048, 2048),
        lambda: c2c(512, 2500),
    ]

    results = {}
    for mode in ("input", "scalar"):
        pf.TW_MODE = mode
        for build in builders:
            tag, fn, args, chk = build()
            try:
                t0 = time.time()
                out = fn(args[0][:2], args[1][:2])
                rel = chk(out)
                if rel > 5e-6:
                    print(f"{mode} {tag}: WRONG rel={rel:.1e}", flush=True)
                    continue
                t = _device_time(fn, args)
                results[(mode, tag)] = t
                print(f"{mode} {tag}: {t*1e3:.3f} ms rel={rel:.1e} "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"{mode} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    print("\nsummary (input vs scalar):", flush=True)
    for (mode, tag), t in sorted(results.items()):
        if mode == "input":
            ts = results.get(("scalar", tag))
            if ts:
                print(f"  {tag}: input {t*1e3:.3f} vs scalar {ts*1e3:.3f} "
                      f"({ts/t:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r39 done", flush=True)
