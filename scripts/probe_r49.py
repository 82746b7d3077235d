#!/usr/bin/env python
"""Round-3 probe I (VERDICT item 3): streamed-output big kernel.

The single-shot big kernel has ONE grid step, so Pallas gives it zero
DMA/compute overlap: the ~12.5 us output copy starts only after all
compute ends (ablation: copy 25 = in 12.5 + out 12.5).  This variant
takes HBM refs (memory_space=ANY) and hand-pipelines the OUTPUT: stage 2
runs in row-chunks of the lane-DFT matrix, and each chunk's rows stream
to HBM via manual async copies while the next chunk's dots run.  Rows of
D[k_l, k_s] are flat-contiguous spans (k = k_s + S*k_l), so each row is
one [S] -> [S] DMA — no relayout anywhere.

Run: nohup setsid python scripts/probe_r49.py > /tmp/probe_r49.out 2>&1 &
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.ops import bigfft
from fft_wgpu_tpu.ops import pallas_fft as pf


def _kernel_stream(xr_hbm, xi_hbm, or_hbm, oi_hbm, xr_v, xi_v, dr_v,
                   di_v, sem_in, sem_out, *, n, sign, scale, chunks):
    S = n // 128
    R = 128 // chunks
    cp1 = pltpu.make_async_copy(xr_hbm, xr_v, sem_in.at[0])
    cp2 = pltpu.make_async_copy(xi_hbm, xi_v, sem_in.at[1])
    cp1.start()
    cp2.start()
    cp1.wait()
    cp2.wait()

    ar = xr_v[0].reshape(S, 128)
    ai = xi_v[0].reshape(S, 128)
    br, bi = pf._dft_sublane_chain(ar, ai, S, sign,
                                   factors=bigfft._CHAIN_SCHEDULE.get(S))
    cr, ci = bigfft._outer_twiddle_mul(br, bi, S, n, sign)

    w2r, w2i = pf._gen_dft(128, 128, 128, sign, scale)
    dmas = []
    for c in range(chunks):
        sl = slice(c * R, (c + 1) * R)
        dr, di = pf._cdot(w2r[sl], (w2r + w2i)[sl], (w2i - w2r)[sl],
                          cr, ci, ((1,), (1,)))  # [R, S]
        dr_v[sl, :] = dr
        di_v[sl, :] = di
        for r in range(R):
            k = c * R + r
            d1 = pltpu.make_async_copy(
                dr_v.at[k, :], or_hbm.at[0, pl.ds(k * S, S)],
                sem_out.at[k, 0])
            d2 = pltpu.make_async_copy(
                di_v.at[k, :], oi_hbm.at[0, pl.ds(k * S, S)],
                sem_out.at[k, 1])
            d1.start()
            d2.start()
            dmas.append(d1)
            dmas.append(d2)
    for d in dmas:
        d.wait()


def fft_big_stream(re, im, sign, scale=None, *, chunks=4):
    n = re.shape[-1]
    S = n // 128
    kern = functools.partial(
        _kernel_stream, n=n, sign=sign,
        scale=float(scale) if scale else 1.0, chunks=chunks)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        kern,
        in_specs=[any_spec, any_spec],
        out_specs=[any_spec, any_spec],
        out_shape=[jax.ShapeDtypeStruct((1, n), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((1, n), jnp.float32),
            pltpu.VMEM((128, S), jnp.float32),
            pltpu.VMEM((128, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((128, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re.reshape(1, n), im.reshape(1, n))


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

    for n in (1 << 20, 1 << 21):
        re = jax.random.normal(jax.random.PRNGKey(0), (1, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (1, n), jnp.float32)
        f0 = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
        o0 = f0(re, im)
        _ = float(jnp.sum(o0[0][:1, :2]))
        t0 = _device_time(f0, (re, im))
        print(f"I 2^{n.bit_length()-1} prod: {t0*1e3:.3f} ms", flush=True)
        for chunks in (4, 8):
            try:
                fs = jax.jit(lambda a, b, _c=chunks: fft_big_stream(
                    a, b, -1, chunks=_c))
                tc = time.time()
                os_ = fs(re, im)
                _ = float(jnp.sum(os_[0][:1, :2]))
                comp = time.time() - tc
                rel = rel_split(os_[0], os_[1], o0[0], o0[1])
                ts = _device_time(fs, (re, im))
                print(f"I 2^{n.bit_length()-1} stream c={chunks}: "
                      f"{ts*1e3:.3f} ms (compile {comp:.0f}s, "
                      f"rel {rel:.2e})", flush=True)
            except Exception as e:
                print(f"I 2^{n.bit_length()-1} stream c={chunks}: FAILED "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
