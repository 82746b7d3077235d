#!/usr/bin/env python
"""Probe: balanced C2R rows kernel (2*Re half-spectrum contraction
factorized over k=k1*n2+k2, real-only stage B) vs the classic _kernel_c2r
(classic times already measured: 4096 1.177, 8192 1.387, 2048 0.641 ms).

Run: nohup setsid python scripts/probe_r20.py > /tmp/probe_r20.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def run(rows, n, spec):
    rng = np.random.RandomState(0)
    x = rng.randn(rows, n).astype(np.float32)
    X = np.fft.rfft(x, axis=-1)
    Xr = jnp.asarray(X.real.astype(np.float32))
    Xi = jnp.asarray(X.imag.astype(np.float32))
    nx = float(np.sqrt((x ** 2).sum()))

    if spec is None:
        f = jax.jit(lambda a, b: pf._irfft_rows_core(a, b, n, 1.0 / n))
        tag = "classic"
    else:
        pf._BALANCED_C2R[n] = spec
        f = jax.jit(lambda a, b: pf._irfft_rows_core(a, b, n, 1.0 / n))
        tag = f"bal {spec}"
    try:
        t0 = time.time()
        out = f(Xr, Xi)
        out.block_until_ready()
        comp = time.time() - t0
        rel = float(np.sqrt(((np.asarray(out) - x) ** 2).sum())) / nx
        t = _device_time(f, (Xr, Xi))
        print(f"c2r {rows}x{n} {tag}: {t*1e3:.3f} ms "
              f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"c2r {rows}x{n} {tag}: FAILED {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)
    finally:
        pf._BALANCED_C2R.pop(n, None)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    run(4096, 4096, (64, 64))
    run(2048, 8192, (64, 128))
    run(4096, 2048, (64, 32))
    run(4096, 2048, (32, 64))


if __name__ == "__main__":
    main()
