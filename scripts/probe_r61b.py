#!/usr/bin/env python
"""Round-4 probe B2: the 16384 floor decomposition (VERDICT r3 item 6).

If the (128,128) family is toolchain-crashed from every direction
(probe_r61), close the cliff with MEASURED bounds at 16384 x 1024:

  copy   — Pallas copy-only kernel at the exact shape (pure-IO floor)
  bound  — the production (256,64)+(4,8,8) kernel with all dots at
           DEFAULT (1-pass bf16) instead of HIGHEST (6 passes): the
           scheduling-free lower bound of any f32-accurate schedule of
           this algorithm (numerics wrong at 3e-3 — timing only)
  prod   — the production kernel (control)

Run: nohup setsid python scripts/probe_r61b.py > /tmp/probe_r61b.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.ops import pallas_fft as pf

N, B = 16384, 1024


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    re = jax.random.normal(jax.random.PRNGKey(0), (B, N), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (B, N), jnp.float32)

    def row(tag, fn):
        try:
            signal.alarm(900)
            f = jax.jit(fn)
            _ = float(jnp.sum(f(re, im)[0].ravel()[:4]))
            t = _device_time(f, (re, im))
            signal.alarm(0)
            print(f"{tag}: {t*1e3:.3f} ms", flush=True)
            return t
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None

    def _copy_kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    spec = pl.BlockSpec((128, N), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    row("copy-only (pure IO floor)",
        lambda a, b: pl.pallas_call(
            _copy_kernel, grid=(B // 128,),
            in_specs=[spec, spec], out_specs=[spec, spec],
            out_shape=[jax.ShapeDtypeStruct((B, N), jnp.float32)] * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024))(a, b))

    row("production (256,64)+(4,8,8) HIGHEST",
        lambda a, b: pf.fft_batched_split(a, b, -1, None))

    saved = pf._MM_PREC
    try:
        pf._MM_PREC = jax.lax.Precision.DEFAULT
        row("production @ DEFAULT 1-pass dots (compute bound)",
            lambda a, b: pf.fft_batched_split(a, b, -1, None))
    finally:
        pf._MM_PREC = saved

    print("probe_r61b done", flush=True)


if __name__ == "__main__":
    main()
