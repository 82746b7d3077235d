#!/usr/bin/env python
"""Probe r34: fully-VPU / VPU-heavy full-row DIT chains for the headline.

Radix-2^2 butterflies made VPU stages much cheaper than when the DIT
schedule was pinned (probe_r5b measured pre-2^2 chains); the balanced
kernel's plateau (~0.633 ms at 4096: VPU stage-1 ~ MXU stage-2 trade
1:1) says the next lever is removing the MXU stage entirely IF all-VPU
stages at tall [n, 128] shapes are cheap enough.

Numerics for every schedule here are pre-validated in interpret mode on
CPU (scripts/vcheck_r34_interp.py) — this probe only measures.

Run: nohup setsid python scripts/probe_r34.py > /tmp/probe_r34.out 2>&1 &
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
    print("probe_r34 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    cases = [
        (4096, 4096, [(4, 8, 4, 8, 4), (8, 8, 8, 8), (4, 4, 4, 4, 4, 4),
                      (4, 8, 8, 16), (4, 8, 4, 32)]),
        (8192, 1024, [(8, 8, 4, 8, 4), (4, 8, 4, 8, 8), (8, 8, 8, 16)]),
    ]
    base = pf._dit_schedule
    for n, rows, schedules in cases:
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        z = np.asarray(re[:2]) + 1j * np.asarray(im[:2])
        oracle = np.fft.fft(z)
        # baseline: production (balanced) for reference timing this run
        fnb = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        got = fnb(re[:2], im[:2])
        g = np.asarray(got[0]) + 1j * np.asarray(got[1])
        print(f"prod {n}: rel {np.linalg.norm(g-oracle)/np.linalg.norm(oracle):.1e}",
              flush=True)
        t = _device_time(fnb, (re, im))
        print(f"prod {n}x{rows}: {t*1e3:.3f} ms", flush=True)
        for sched in schedules:
            pf._dit_schedule = lambda S, _s=sched, _n=n: (
                _s if S == _n else base(S))
            try:
                fn = jax.jit(lambda a, b, _s=sched: pf.fft_batched_split(
                    a, b, -1, schedule="dit"))
                print(f"compiling dit {n} {sched}...", flush=True)
                t0 = time.time()
                got = fn(re[:2], im[:2])
                g = np.asarray(got[0]) + 1j * np.asarray(got[1])
                rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
                if rel > 5e-6:
                    print(f"dit {n} {sched}: WRONG rel={rel:.1e}", flush=True)
                    continue
                t = _device_time(fn, (re, im))
                print(f"dit {n}x{rows} {sched}: {t*1e3:.3f} ms "
                      f"(compile {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"dit {n} {sched}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            finally:
                pf._dit_schedule = base


if __name__ == "__main__":
    main()
    print("probe_r34 done", flush=True)
