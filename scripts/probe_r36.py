#!/usr/bin/env python
"""Probe r36: stock XLA jnp.fft vs this framework's kernels on the
benchmark shapes (device time, same harness).  Both sides run as one
jitted program with split-f32 inputs/outputs (the complex assembly and
re/im extraction fuse into the XLA FFT program; the framework's kernels
are natively split).

Run: nohup setsid python scripts/probe_r36.py > /tmp/probe_r36.out 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time


def row(tag, fn, args):
    try:
        o = fn(*args)
        _ = float(jnp.sum(o[0].ravel()[:8]))
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms", flush=True)
        return t
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r36 start", flush=True)
    from fft_wgpu_tpu.ops import pallas_fft as pf
    from fft_wgpu_tpu.ops.rfft import irfft_last_split, rfft_last_split

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- batched 1-D C2C 4096 x 4096 ----
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)

    xla_fft = jax.jit(lambda a, b: (
        lambda X: (jnp.real(X), jnp.imag(X)))(
            jnp.fft.fft(jax.lax.complex(a, b), axis=-1)))
    ours_fft = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    # cross-check before timing (metric computed ON DEVICE in one jit —
    # eager complex chains are unimplemented on this runtime)
    relf = jax.jit(lambda a1, b1, a2, b2: jnp.sqrt(
        jnp.sum((a1 - a2) ** 2 + (b1 - b2) ** 2)
        / jnp.sum(a1 ** 2 + b1 ** 2)))
    g1 = xla_fft(re[:2], im[:2])
    g2 = ours_fft(re[:2], im[:2])
    rel = float(relf(g1[0], g1[1], g2[0], g2[1]))
    print(f"cross-check 1d: rel {rel:.1e}", flush=True)
    row("xla  jnp.fft.fft  4096x4096", xla_fft, (re, im))
    row("ours fft_batched  4096x4096", ours_fft, (re, im))

    # ---- 2-D 4096^2 ----
    xla_fft2 = jax.jit(lambda a, b: (
        lambda X: (jnp.real(X), jnp.imag(X)))(
            jnp.fft.fft2(jax.lax.complex(a, b))))
    ours_fft2 = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
    row("xla  jnp.fft.fft2 4096^2", xla_fft2, (re, im))
    row("ours fft2         4096^2", ours_fft2, (re, im))

    # ---- R2C 4096 x 4096 ----
    xla_rfft = jax.jit(lambda a: (
        lambda X: (jnp.real(X), jnp.imag(X)))(jnp.fft.rfft(a, axis=-1)))
    ours_rfft = jax.jit(lambda a: rfft_last_split(a, None))
    row("xla  jnp.fft.rfft 4096x4096", xla_rfft, (re,))
    row("ours rfft         4096x4096", ours_rfft, (re,))

    # ---- C2R 4096 x 4096 ----
    Xr = jax.random.normal(k0, (4096, 2049), jnp.float32)
    Xi = jax.random.normal(k1, (4096, 2049), jnp.float32)
    xla_irfft = jax.jit(lambda a, b: (
        jnp.fft.irfft(jax.lax.complex(a, b), n=4096, axis=-1),))
    ours_irfft = jax.jit(lambda a, b: (irfft_last_split(a, b, 4096,
                                                        1.0 / 4096),))
    row("xla  jnp.fft.irfft 4096x4096", xla_irfft, (Xr, Xi))
    row("ours irfft         4096x4096", ours_irfft, (Xr, Xi))

    # ---- 2^20 single-shot ----
    rb = jax.random.normal(k0, (1 << 20,), jnp.float32)
    ib = jax.random.normal(k1, (1 << 20,), jnp.float32)
    xla_big = jax.jit(lambda a, b: (
        lambda X: (jnp.real(X), jnp.imag(X)))(
            jnp.fft.fft(jax.lax.complex(a, b))))
    import fft_wgpu_tpu as ftt
    p = ftt.plan(1 << 20)
    ours_big = jax.jit(lambda a, b: p._execute_split(a, b, -1, None))
    row("xla  jnp.fft.fft  2^20", xla_big, (rb, ib))
    row("ours plan         2^20", ours_big, (rb, ib))
    print("probe_r36 done", flush=True)


if __name__ == "__main__":
    main()
