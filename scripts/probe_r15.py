#!/usr/bin/env python
"""Validate the productionized balanced row schedule on hardware.

Auto routing should now pick balanced for n in {512, 1024, 4096, 8192}
and reproduce probe_r13/r14's wins through the public fft_batched_split
path (incl. folded-scale inverse).

Run: nohup setsid python scripts/probe_r15.py > /tmp/probe_r15.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    shapes = [(4096, 4096), (2500, 512), (2048, 1024), (2048, 2048),
              (1024, 8192)]
    for rows, n in shapes:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        f = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        fc = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                       schedule="classic"))
        t0 = time.time()
        o = f(re, im)
        _ = float(jnp.sum(o[0][:2, :2]))
        comp = time.time() - t0
        oc = fc(re, im)
        _ = float(jnp.sum(oc[0][:2, :2]))
        rel = float(jax.jit(
            lambda a, b, c, d: jnp.sqrt(
                (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
                / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
        )(o[0], o[1], oc[0], oc[1]))
        t = _device_time(f, (re, im))
        tc = _device_time(fc, (re, im))
        print(f"{rows}x{n}: auto={t*1e3:.3f} ms  classic={tc*1e3:.3f} ms "
              f"(compile {comp:.0f}s, rel-vs-classic {rel:.2e})", flush=True)
        # folded-scale inverse through the same routing
        fi = jax.jit(lambda a, b: pf.fft_batched_split(a, b, +1, 1.0 / n))
        oi = fi(o[0], o[1])
        rtrip = float(jax.jit(
            lambda a, b, c, d: jnp.sqrt(
                (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
                / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
        )(oi[0], oi[1], re, im))
        ti = _device_time(fi, (o[0], o[1]))
        print(f"          inv={ti*1e3:.3f} ms  roundtrip relL2={rtrip:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
