#!/usr/bin/env python
"""Production-routing validation of the round-3 kernel changes:
pipe2 row kernels (512..4096), 16384 balanced R2C/C2R pins, padded
serving-form round trip, fftconvolve padded pipeline.  Oracle checks on
device + profiler device times.

Run: nohup setsid python scripts/vcheck_r46.py > /tmp/vcheck_r46.out 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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

    # pipe2 production routing vs XLA oracle
    for n, rows in [(512, 2500), (1024, 2048), (2048, 2048), (4096, 4096),
                    (4096, 200)]:  # 200: ragged 256-block edge
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n),
                               jnp.float32)
        fn = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        orc = jax.jit(lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
            jnp.fft.fft(jax.lax.complex(a, b), axis=-1)))
        got = fn(re, im)
        want = orc(re, im)
        rel = rel_split(got[0], got[1], want[0], want[1])
        dt = _device_time(fn, (re, im))
        print(f"C2C n={n} x {rows}: {dt*1e3:.3f} ms, rel {rel:.2e}",
              flush=True)

    # 16384 balanced real pins through production routing
    n, rows = 16384, 1024
    x = jax.random.normal(jax.random.PRNGKey(2), (rows, n), jnp.float32)
    fr = jax.jit(lambda a: pf.rfft_rows_split(a))
    Xr, Xi = fr(x)
    orc = jax.jit(lambda v: (lambda X: (jnp.real(X), jnp.imag(X)))(
        jnp.fft.rfft(v, axis=-1)))
    wr, wi = orc(x)
    rel = rel_split(Xr, Xi, wr, wi)
    dt = _device_time(fr, (x,))
    print(f"R2C 16384 x {rows}: {dt*1e3:.3f} ms, rel {rel:.2e}", flush=True)

    fc = jax.jit(lambda a, b: pf.irfft_rows_split(a, b, n, 1.0 / n))
    y = fc(Xr, Xi)
    worc = jax.jit(lambda a, b: jnp.fft.irfft(jax.lax.complex(a, b), n=n,
                                              axis=-1))
    wy = worc(Xr, Xi)
    rel = float(jax.jit(lambda a, c: jnp.sqrt(
        jnp.sum((a - c) ** 2) / jnp.sum(c ** 2)))(y, wy))
    dt = _device_time(fc, (Xr, Xi))
    print(f"C2R 16384 x {rows}: {dt*1e3:.3f} ms, rel {rel:.2e}", flush=True)

    # padded serving round trip at 4096 (the probe_r45 win, through the
    # public pad_out/padded_in surface)
    n, rows = 4096, 4096
    x = jax.random.normal(jax.random.PRNGKey(3), (rows, n), jnp.float32)

    def rt(v):
        pr, pi = pf.rfft_rows_split(v, pad_out=True)
        return pf.irfft_rows_split(pr, pi, n, 1.0 / n, padded_in=True)

    frt = jax.jit(rt)
    back = frt(x)
    rel = float(jax.jit(lambda a, c: jnp.sqrt(
        jnp.sum((a - c) ** 2) / jnp.sum(c ** 2)))(back, x))
    dt = _device_time(frt, (x,))
    fp = jax.jit(lambda v: pf.rfft_rows_split(v, pad_out=True))
    dtf = _device_time(fp, (x,))
    fci = jax.jit(lambda a, b: pf.irfft_rows_split(a, b, n, 1.0 / n,
                                                   padded_in=True))
    pr, pi = fp(x)
    dtc = _device_time(fci, (pr, pi))
    print(f"padded R2C 4096: {dtf*1e3:.3f} ms; padded C2R: {dtc*1e3:.3f} "
          f"ms; round trip {dt*1e3:.3f} ms, rel {rel:.2e}", flush=True)

    # fftconvolve real path (padded pipeline end-to-end) vs XLA oracle
    from fft_wgpu_tpu.ops.helpers import fftconvolve
    a = jax.random.normal(jax.random.PRNGKey(4), (512, 3000), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(5), (1, 129), jnp.float32)
    got = fftconvolve(a, b, mode="same", axes=(-1,))
    want = jax.jit(lambda u, v: jnp.fft.irfft(
        jnp.fft.rfft(u, 4096) * jnp.fft.rfft(v, 4096), 4096
    )[..., 64:64 + 3000])(a, b)
    rel = float(jax.jit(lambda g, w: jnp.sqrt(
        jnp.sum((g - w) ** 2) / jnp.sum(w ** 2)))(got, want))
    print(f"fftconvolve same 512x3000 (*129): rel {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
