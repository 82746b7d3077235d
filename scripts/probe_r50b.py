#!/usr/bin/env python
"""Round-3 probe J2: BATCHED big kernel via the [rows, 1, n] view, c=1.

probe_r50 showed grid-chunked stage-2 output streaming loses (R-row dots
underfill the MXU's 128-row output tile) — but its batched section proved
the [rows, 1, n] view COMPILES with (1, 1, n) blocks, which the flat
[rows, n] form never could (block sublane dim 1 neither divides 8 nor
equals rows).  This probe measures the clean unchunked form: the
production monolithic kernel body, grid (rows,), no scratch — Pallas's
cross-row double buffering should hide the input DMA that the single-row
form exposes.  Production alternative today: the two-pass four-step at
0.250 ms/row (2^21 x8).

Run: nohup setsid python scripts/probe_r50b.py > /tmp/probe_r50b.out 2>&1 &
"""
import functools
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.ops import bigfft, fourstep
from fft_wgpu_tpu.ops import pallas_fft as pf


def _kernel3(xr_ref, xi_ref, or_ref, oi_ref, *, n, sign, scale):
    S = n // 128
    ar = xr_ref[0, 0].reshape(S, 128)
    ai = xi_ref[0, 0].reshape(S, 128)
    br, bi = pf._dft_sublane_chain(ar, ai, S, sign,
                                   factors=bigfft._CHAIN_SCHEDULE.get(S))
    cr, ci = bigfft._outer_twiddle_mul(br, bi, S, n, sign)
    w2r, w2i = pf._gen_dft(128, 128, 128, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[0, 0] = dr.reshape(n)
    oi_ref[0, 0] = di.reshape(n)


def fft_big_batched(re, im, sign, scale=None):
    rows, n = re.shape
    kern = functools.partial(_kernel3, n=n, sign=sign,
                             scale=float(scale) if scale else 1.0)
    spec = pl.BlockSpec((1, 1, n), lambda r: (r, 0, 0),
                        memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, 1, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re.reshape(rows, 1, n), im.reshape(rows, 1, n))
    return out_r.reshape(rows, n), out_i.reshape(rows, n)


def rel_split(a, b, c, d):
    return float(jax.jit(
        lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
    )(a, b, c, d))


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    for n, rows in ((1 << 20, 8), (1 << 21, 8), (1 << 18, 32)):
        re = jax.random.normal(jax.random.PRNGKey(2), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(3), (rows, n), jnp.float32)
        # production today: four-step two-pass
        f0 = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1))
        o0 = f0(re, im)
        _ = float(jnp.sum(o0[0][:1, :2]))
        t0 = _device_time(f0, (re, im))
        print(f"J2 2^{n.bit_length()-1} x{rows} four-step: {t0*1e3:.3f} ms "
              f"= {t0*1e3/rows:.3f}/row", flush=True)
        try:
            signal.alarm(900)
            fb = jax.jit(lambda a, b: fft_big_batched(a, b, -1))
            tc = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:1, :2]))
            comp = time.time() - tc
            signal.alarm(0)
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"J2 2^{n.bit_length()-1} x{rows} big-batched: "
                  f"{tb*1e3:.3f} ms = {tb*1e3/rows:.3f}/row "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"J2 2^{n.bit_length()-1} x{rows} big-batched: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # single-row via the rank-3 view (sanity: should match production)
    n = 1 << 20
    re = jax.random.normal(jax.random.PRNGKey(0), (1, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, n), jnp.float32)
    f0 = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:1, :2]))
    fb = jax.jit(lambda a, b: fft_big_batched(a, b, -1))
    ob = fb(re, im)
    _ = float(jnp.sum(ob[0][:1, :2]))
    rel = rel_split(ob[0], ob[1], o0[0], o0[1])
    tb = _device_time(fb, (re, im))
    print(f"J2 2^20 x1 rank3 view: {tb*1e3:.3f} ms (rel {rel:.2e})",
          flush=True)


if __name__ == "__main__":
    main()
