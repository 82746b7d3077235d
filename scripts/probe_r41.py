#!/usr/bin/env python
"""Probe r41: 2^22 single-pass big kernel.

Previously rejected by the compile service (VMEM: 64 MB io + ~64 MB chain
liveness + 32 MB direct twiddle table).  The factored outer twiddle
(probe_r40) eliminates the 32 MB table, so the tall [32768, 128] form may
now fit v5e VMEM.  Tries chain schedules and compares against the
four-step (current router choice at 2^22 single-row).

Run: nohup setsid python scripts/probe_r41.py > /tmp/probe_r41.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import bigfft, fourstep


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r41 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    n = 1 << 22
    re = jax.random.normal(k0, (n,), jnp.float32)
    im = jax.random.normal(k1, (n,), jnp.float32)
    oracle = np.fft.fft(np.asarray(re).astype(np.float64)
                        + 1j * np.asarray(im))[:8]

    bigfft.BIG_MAX_N = 1 << 22

    for sched in ((4, 4, 4, 8, 64), (4, 4, 4, 4, 4, 32), (8, 8, 8, 64)):
        bigfft._CHAIN_SCHEDULE[32768] = sched
        fn = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
        try:
            t0 = time.time()
            out = fn(re, im)
            g = np.asarray(out[0])[:8] + 1j * np.asarray(out[1])[:8]
            rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
            if rel > 5e-5:
                print(f"big 2^22 {sched}: WRONG rel={rel:.1e}", flush=True)
                continue
            t = _device_time(fn, (re, im))
            print(f"big 2^22 {sched}: {t*1e3:.3f} ms rel={rel:.1e} "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"big 2^22 {sched}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
        finally:
            jax.clear_caches()

    # comparison: the four-step on the same single row
    fn = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1))
    out = fn(re[None], im[None])
    g = np.asarray(out[0])[0, :8] + 1j * np.asarray(out[1])[0, :8]
    rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
    t = _device_time(fn, (re[None], im[None]))
    print(f"fourstep 2^22x1: {t*1e3:.3f} ms rel={rel:.1e}", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r41 done", flush=True)
