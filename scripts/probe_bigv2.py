#!/usr/bin/env python
"""bigfft tall-layout variant at n=2^20 rows=1.

Current kernel (square [1024,1024] layout): 157 us, stages 3.6x over the
MAC model on wide-lane operands.  Tall variant: view the row [n/128, 128]
(lanes fixed at 128, the proven kernel shape):

    stage 1: DIT sublane chain over S = n/128 (8, 32, 32)   [256 MACs/pt]
    twiddle: w_n^{k_s * m_l}  (direct 2-D gen: products < n <= 2^24 exact)
    stage 2: lane Gauss128 -> result [k_l, k_s] == natural order flat
             (no transpose at all)

640 MACs/pt vs 512, but all dot shapes are the row kernel's model-exact
ones.  Run: nohup setsid python scripts/probe_bigv2.py > /tmp/probe_bigv2.out 2>&1 &
"""
from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

enable_persistent_compilation_cache()

from bench import _device_time
from fft_wgpu_tpu.ops import bigfft as bf
from fft_wgpu_tpu.ops import pallas_fft as pf

N = 1 << 20
S = N // 128  # 8192


def _kernel_tall(xr_ref, xi_ref, or_ref, oi_ref, *, n, sign, scale):
    ar = xr_ref[0].reshape(S, 128)
    ai = xi_ref[0].reshape(S, 128)

    # stage 1: DFT_S over sublanes, natural order out
    br, bi = pf._dft_sublane_chain(ar, ai, S, sign)

    # inter twiddle w_n^{k_s * m_l}: k_s*m_l < n <= 2^24, exact direct gen
    twr, twi = pf._gen_twiddle(S, 128, n, sign)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # stage 2: contract the 128 lanes -> [k_l, k_s]; flat row-major IS the
    # natural order X[k_s + S*k_l]
    w2r, w2i = pf._gen_dft(128, 128, 128, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))

    or_ref[0] = dr.reshape(n)
    oi_ref[0] = di.reshape(n)


def build():
    kern = functools.partial(_kernel_tall, n=N, sign=-1, scale=1.0)
    spec = pl.BlockSpec((1, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kern, grid=(1,), in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((1, N), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )
    return jax.jit(lambda a, b: f(a, b))


def main():
    re = jax.random.normal(jax.random.PRNGKey(0), (1, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (1, N), jnp.float32)
    base = jax.jit(lambda a, b: bf.fft_big_split(a, b, -1))
    br_, bi_ = base(re, im)
    try:
        t0 = time.time()
        fn = build()
        o = fn(re, im)
        _ = float(jnp.sum(o[0][:, :8]))
        comp = time.time() - t0
        rel = float(jax.jit(lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2))))(*o, br_, bi_))
        dt = _device_time(fn, (re, im))
        dt0 = _device_time(base, (re, im))
        print(f"tall: {dt*1e6 if dt else -1:.0f} us  square: {dt0*1e6 if dt0 else -1:.0f} us  "
              f"rel={rel:.2e} (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"tall: FAILED {type(e).__name__}: {e}"[:300], flush=True)


if __name__ == "__main__":
    main()
