#!/usr/bin/env python
"""Probe: (a) n=16384 balanced (128,128) with VPU chains vs the DIT chain
(1.133 ms); (b) 2^21 four-step factors (512,4096) vs even (1024,2048).

Run: nohup setsid python scripts/probe_r18.py > /tmp/probe_r18.out 2>&1 &
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

    # (a) 16384 x 1024 rows
    rows, n = 1024, 16384
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
    fd = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, schedule="dit"))
    od = fd(re, im)
    _ = float(jnp.sum(od[0][:2, :2]))
    td = _device_time(fd, (re, im))
    print(f"16384x1024 dit: {td*1e3:.3f} ms", flush=True)
    for n1, n2, factors in [(128, 128, (4, 4, 8)), (128, 128, (2, 4, 4, 4)),
                            (64, 256, (4, 4, 4))]:
        pf._BALANCED[n] = (n1, n2, factors)
        try:
            fb = jax.jit(lambda a, b: pf.fft_batched_split(
                a, b, -1, schedule="balanced"))
            t0 = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - t0
            rel = rel_split(ob[0], ob[1], od[0], od[1])
            tb = _device_time(fb, (re, im))
            print(f"16384 bal ({n1},{n2}) {factors}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"16384 bal ({n1},{n2}) {factors}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
        finally:
            del pf._BALANCED[n]

    # (b) 2^21 four-step factors
    from fft_wgpu_tpu.ops import fourstep as fs
    import fft_wgpu_tpu.ops.fourstep as fsmod
    n = 1 << 21
    re4 = jax.random.normal(jax.random.PRNGKey(2), (8, n), jnp.float32)
    im4 = jax.random.normal(jax.random.PRNGKey(3), (8, n), jnp.float32)
    orig = fsmod.choose_factors
    ref_o = None
    for n1, n2 in [(1024, 2048), (512, 4096), (256, 8192)]:
        fsmod.choose_factors = lambda _n, _f=(n1, n2): _f
        try:
            f4 = jax.jit(lambda a, b: fs.fft_last_axis(a, b, -1))
            o4 = f4(re4, im4)
            _ = float(jnp.sum(o4[0][:2, :2]))
            if ref_o is None:
                ref_o, rel = o4, 0.0
            else:
                rel = rel_split(o4[0], o4[1], ref_o[0], ref_o[1])
            t4 = _device_time(f4, (re4, im4))
            print(f"2^21x8 ({n1},{n2}): {t4*1e3:.3f} ms (rel {rel:.2e})",
                  flush=True)
        except Exception as e:
            print(f"2^21x8 ({n1},{n2}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            fsmod.choose_factors = orig


if __name__ == "__main__":
    main()
