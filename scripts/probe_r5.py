#!/usr/bin/env python
"""Row-kernel schedule shootout on hardware: classic (two-factor lane
split) vs dit (transpose-in sublane chain, 256 MACs/pt) through the
production fft_batched_split path.

Run: nohup setsid python scripts/probe_r5.py > /tmp/probe_r5.out 2>&1 &
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    bw = 819e9
    for n, rows in [(4096, 4096), (8192, 2048), (2048, 8192),
                    (1024, 16384), (16384, 1024)]:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        fns = {}
        for sched in ("classic", "dit"):
            fns[sched] = jax.jit(
                lambda a, b, s=sched: pf.fft_batched_split(a, b, -1, schedule=s))
        res = {}
        outs = {}
        for sched, fn in fns.items():
            try:
                t0 = time.time()
                o = fn(re, im)
                _ = float(jnp.sum(o[0][:2, :2]))
                comp = time.time() - t0
                res[sched] = _device_time(fn, (re, im))
                outs[sched] = o
            except Exception as e:
                print(f"n={n} {sched}: FAILED {type(e).__name__}: {e}"[:250],
                      flush=True)
        if len(res) == 2:
            rel = float(jax.jit(lambda a, b, c, d: jnp.sqrt(
                (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
                / (jnp.sum(c ** 2) + jnp.sum(d ** 2))))(
                    *outs["dit"], *outs["classic"]))
            t1 = 2 * rows * n * 8 / bw
            print(f"n={n} rows={rows}: classic={res['classic']*1e3:.3f} ms "
                  f"({t1/res['classic']:.1%})  dit={res['dit']*1e3:.3f} ms "
                  f"({t1/res['dit']:.1%})  speedup={res['classic']/res['dit']:.2f}x "
                  f"rel={rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
