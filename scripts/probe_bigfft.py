#!/usr/bin/env python
"""Hardware probe: single-pass big-N kernel vs the two-pass four-step.

Validates on-device (XLA fft oracle at n<=2^20; roundtrip everywhere) and
times with the profiler.  Run detached:
  nohup setsid python scripts/probe_bigfft.py > /tmp/probe_bigfft.out 2>&1 &
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import bigfft, fourstep


def run(n, rows):
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)

    big_f = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
    big_i = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, +1, 1.0 / n))
    four = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1, None))

    t0 = time.time()
    fr, fi = big_f(re, im)
    rr, ri = big_i(fr, fi)
    rt = float(jnp.sqrt(jnp.sum((rr - re) ** 2 + (ri - im) ** 2)
                        / jnp.sum(re ** 2 + im ** 2)))
    compile_s = time.time() - t0

    # cross-check vs the existing four-step path (itself oracle-validated)
    gr, gi = four(re, im)
    x2 = float(jnp.sqrt(jnp.sum((fr - gr) ** 2 + (fi - gi) ** 2)
                        / jnp.sum(gr ** 2 + gi ** 2)))

    dt_big = _device_time(big_f, (re, im))
    dt_four = _device_time(four, (re, im))
    bw = 819e9
    t1pass = 2 * rows * n * 8 / bw
    print(f"n=2^{n.bit_length()-1} rows={rows}: big={dt_big*1e3:.3f} ms "
          f"({t1pass/dt_big:.1%} of 1-pass roofline)  four-step={dt_four*1e3:.3f} ms  "
          f"speedup={dt_four/dt_big:.2f}x  roundtrip={rt:.2e} vs_fourstep={x2:.2e} "
          f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    for n, rows in [(1 << 20, 1), (1 << 20, 8), (1 << 15, 64), (1 << 18, 16),
                    (1 << 21, 4)]:
        try:
            run(n, rows)
        except Exception as e:
            print(f"n={n} rows={rows}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
