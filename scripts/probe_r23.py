#!/usr/bin/env python
"""Probe: VPU-heavier DIT chain schedules for (a) the 16384 rows kernel
(current (4,4,32,32): 1.133 ms @1024 rows) and (b) bigfft 2^21 single-shot
(S=16384, same default chain).  Motivated by probe_r21/r22: tall [S,128]
operands pay MXU fill penalties that VPU butterflies don't.

Run: nohup setsid python scripts/probe_r23.py > /tmp/probe_r23.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import bigfft


def rel_split(a, b, c, d):
    return float(jax.jit(
        lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
    )(a, b, c, d))


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # (a) 16384 rows kernel chain schedules
    rows, n = 1024, 16384
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
    orig = pf._dit_schedule
    ref_o = None
    for factors in [(4, 4, 32, 32), (4, 4, 4, 4, 64), (2, 4, 4, 8, 64),
                    (4, 4, 8, 128)]:
        pf._dit_schedule = (lambda s, _f=factors, _o=orig:
                            _f if s == n else _o(s))
        try:
            fd = jax.jit(lambda a, b: pf.fft_batched_split(
                a, b, -1, schedule="dit"))
            tc = time.time()
            od = fd(re, im)
            _ = float(jnp.sum(od[0][:2, :2]))
            comp = time.time() - tc
            if ref_o is None:
                ref_o, rel = od, 0.0
            else:
                rel = rel_split(od[0], od[1], ref_o[0], ref_o[1])
            td = _device_time(fd, (re, im))
            print(f"16384 rows chain {factors}: {td*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"16384 rows chain {factors}: FAILED {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
        finally:
            pf._dit_schedule = orig

    # (b) bigfft 2^21 single-shot chain schedules
    n2_ = 1 << 21
    S = n2_ // 128
    reb = jax.random.normal(jax.random.PRNGKey(2), (1, n2_), jnp.float32)
    imb = jax.random.normal(jax.random.PRNGKey(3), (1, n2_), jnp.float32)
    ref_b = None
    for factors in [(4, 4, 32, 32), (4, 4, 4, 4, 64), (4, 4, 8, 128)]:
        bigfft._CHAIN_SCHEDULE[S] = factors
        try:
            fb = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
            tc = time.time()
            ob = fb(reb, imb)
            _ = float(jnp.sum(ob[0][:1, :2]))
            comp = time.time() - tc
            if ref_b is None:
                ref_b, rel = ob, 0.0
            else:
                rel = rel_split(ob[0], ob[1], ref_b[0], ref_b[1])
            tb = _device_time(fb, (reb, imb))
            print(f"2^21 chain {factors}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"2^21 chain {factors}: FAILED {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
        finally:
            bigfft._CHAIN_SCHEDULE.pop(S, None)


if __name__ == "__main__":
    main()
