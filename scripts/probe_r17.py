#!/usr/bin/env python
"""Measure: (a) axis0 kernel with VPU stage-1 chains, (b) 2^22 four-step
factor choices now that rows_t is balanced for n in {512,1024,4096,8192}.

Run: nohup setsid python scripts/probe_r17.py > /tmp/probe_r17.out 2>&1 &
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

    # (a) ax0 kernel, n=4096 x 4096 lanes (was 0.844 ms with realcat64 s1)
    re = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.float32)
    fa = jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1))
    fr = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    t0 = time.time()
    oa = fa(re, im)
    _ = float(jnp.sum(oa[0][:2, :2]))
    comp = time.time() - t0
    orow = fr(jnp.swapaxes(re, 0, 1), jnp.swapaxes(im, 0, 1))
    rel = rel_split(oa[0], oa[1], jnp.swapaxes(orow[0], 0, 1),
                    jnp.swapaxes(orow[1], 0, 1))
    ta = _device_time(fa, (re, im))
    print(f"ax0 4096x4096: {ta*1e3:.3f} ms (was 0.844; compile {comp:.0f}s, "
          f"rel {rel:.2e})", flush=True)
    for n in (1024, 2048):
        reN = re[:n]
        imN = im[:n]
        fan = jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1))
        o = fan(reN, imN)
        _ = float(jnp.sum(o[0][:2, :2]))
        tn = _device_time(fan, (reN, imN))
        print(f"ax0 {n}x4096: {tn*1e3:.3f} ms", flush=True)

    # (b) four-step 2^22 factor choices
    from fft_wgpu_tpu.ops import fourstep as fs
    n = 1 << 22
    re4 = jax.random.normal(jax.random.PRNGKey(2), (4, n), jnp.float32)
    im4 = jax.random.normal(jax.random.PRNGKey(3), (4, n), jnp.float32)
    f_ref = jax.jit(lambda a, b: fs.fft_last_axis(a, b, -1))
    o_ref = f_ref(re4, im4)
    _ = float(jnp.sum(o_ref[0][:2, :2]))
    t_ref = _device_time(f_ref, (re4, im4))
    print(f"2^22x4 (2048,2048): {t_ref*1e3:.3f} ms", flush=True)

    import fft_wgpu_tpu.ops.fourstep as fsmod
    orig = fsmod.choose_factors
    for n1, n2 in [(1024, 4096), (512, 8192), (4096, 1024)]:
        fsmod.choose_factors = lambda _n, _f=(n1, n2): _f
        try:
            f4 = jax.jit(lambda a, b: fs.fft_last_axis(a, b, -1))
            t0 = time.time()
            o4 = f4(re4, im4)
            _ = float(jnp.sum(o4[0][:2, :2]))
            comp = time.time() - t0
            rel = rel_split(o4[0], o4[1], o_ref[0], o_ref[1])
            t4 = _device_time(f4, (re4, im4))
            print(f"2^22x4 ({n1},{n2}): {t4*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"2^22x4 ({n1},{n2}): FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            fsmod.choose_factors = orig


if __name__ == "__main__":
    main()
