#!/usr/bin/env python
"""Measure the balanced rows_t kernel: 2-D two-pass, four-step 2^22.

Run: nohup setsid python scripts/probe_r16.py > /tmp/probe_r16.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def rel_split(a, b, c, d):
    return float(jax.jit(
        lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
    )(a, b, c, d))


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # 2-D 4096^2 (two rows_t passes, now balanced)
    re = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.float32)
    f2 = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
    t0 = time.time()
    o = f2(re, im)
    _ = float(jnp.sum(o[0][:2, :2]))
    print(f"2-D 4096^2 balanced: compile {time.time()-t0:.0f}s", flush=True)
    t = _device_time(f2, (re, im))
    print(f"2-D 4096^2 balanced: {t*1e3:.3f} ms (was 1.752)", flush=True)

    # rows FFT sanity vs the (balanced) row kernel: same math, transposed
    fr = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    orow = fr(re, im)
    ft = jax.jit(lambda a, b: pf.fft_rows_transposed_split(a, b, -1))
    ot = ft(re, im)
    rel = rel_split(ot[0], ot[1], jnp.swapaxes(orow[0], -1, -2),
                    jnp.swapaxes(orow[1], -1, -2))
    tt = _device_time(ft, (re, im))
    print(f"rows_t 4096: {tt*1e3:.3f} ms  rel-vs-rows {rel:.2e}", flush=True)

    # four-step 2^22 x 4 (pass 1 axis0 + pass 2 rows_t balanced)
    from fft_wgpu_tpu.ops import fourstep
    n = 1 << 22
    re4 = jax.random.normal(jax.random.PRNGKey(2), (4, n), jnp.float32)
    im4 = jax.random.normal(jax.random.PRNGKey(3), (4, n), jnp.float32)
    f4 = jax.jit(lambda a, b: fourstep.fft_fourstep_split(a, b, -1))
    t0 = time.time()
    o4 = f4(re4, im4)
    _ = float(jnp.sum(o4[0][:2, :2]))
    print(f"2^22 x 4: compile {time.time()-t0:.0f}s", flush=True)
    t4 = _device_time(f4, (re4, im4))
    print(f"2^22 x 4 fourstep: {t4*1e3:.3f} ms (was 3.04)", flush=True)


if __name__ == "__main__":
    main()
