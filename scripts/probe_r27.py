#!/usr/bin/env python
"""Probe: (1) fht/ifht on TPU vs scipy oracle; (2) headline 4096 chain
variants post radix-2^2 butterflies ((4,4,4) vs (8,8) vs (2,4,8));
(3) balanced R2C/C2R re-measure after the f=4 REAL radix stage (9d63d5d).

Run: nohup setsid python scripts/probe_r27.py > /tmp/probe_r27.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def row(tag, fn, args, check=None):
    try:
        t0 = time.time()
        o = fn(*args)
        first = o[0] if isinstance(o, (tuple, list)) else o
        _ = float(jnp.sum(first.ravel()[:8]))
        comp = time.time() - t0
        extra = f", rel {check(o):.2e}" if check is not None else ""
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s{extra})",
              flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:180]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # ---- (1) fht on the TPU backend vs scipy ----
    try:
        import scipy.fft as sf

        import fft_wgpu_tpu as ftt

        n, dln, mu = 128, 0.05, 0.5
        off = float(sf.fhtoffset(dln, mu))
        r = np.exp((np.arange(n) - (n - 1) / 2) * dln)
        a = (r**2 * np.exp(-(r**2) / 2)).astype(np.float64)
        ours = np.asarray(ftt.fht(a.astype(np.float32), dln, mu, offset=off))
        ref = sf.fht(a, dln, mu, offset=off)
        rel = np.linalg.norm(ours - ref) / np.linalg.norm(ref)
        back = np.asarray(ftt.ifht(ours.astype(np.float32), dln, mu,
                                   offset=off))
        rel2 = np.linalg.norm(back - a) / np.linalg.norm(a)
        print(f"fht TPU vs scipy: rel {rel:.2e}, roundtrip {rel2:.2e}",
              flush=True)
    except Exception as e:
        print(f"fht TPU: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)

    def chk_c2c(o):
        rref = np.fft.fft(np.asarray(re[:64]) + 1j * np.asarray(im[:64]),
                          axis=-1)
        return float(np.sqrt(((np.asarray(o[0][:64]) - rref.real) ** 2
                              + (np.asarray(o[1][:64]) - rref.imag) ** 2).sum()
                             / (abs(rref) ** 2).sum()))

    # ---- (2) headline chain variants ----
    for factors in [(4, 4, 4), (8, 8), (2, 4, 8), (4, 8, 2)]:
        pf._BALANCED[4096] = (64, 64, factors)
        row(f"4096 bal {factors}",
            jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                      schedule="balanced")),
            (re, im), chk_c2c)
    pf._BALANCED[4096] = (64, 64, (4, 4, 4))

    # 8192 variants: (64,128) chain alternatives
    re8 = jax.random.normal(k0, (1024, 8192), jnp.float32)
    im8 = jax.random.normal(k1, (1024, 8192), jnp.float32)
    for factors in [(4, 4, 4), (8, 8)]:
        pf._BALANCED[8192] = (64, 128, factors)
        row(f"8192 bal {factors}",
            jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                      schedule="balanced")),
            (re8, im8))
    pf._BALANCED[8192] = (64, 128, (4, 4, 4))

    # ---- (3) balanced real kernels post f=4-real stage ----
    for n, b in [(2048, 4096), (4096, 4096), (8192, 2048)]:
        x = jax.random.normal(k0, (b, n), jnp.float32)
        row(f"r2c {n} x {b}", jax.jit(lambda a: pf._rfft_rows_core(a)), (x,))
    # r2c chain variants at 4096
    x = jax.random.normal(k0, (4096, 4096), jnp.float32)
    for factors in [(8, 8), (2, 4, 8)]:
        pf._BALANCED_R2C[4096] = (64, 64, factors)
        row(f"r2c 4096 bal {factors}",
            jax.jit(lambda a: pf._rfft_rows_core(a)), (x,))
    pf._BALANCED_R2C[4096] = (64, 64, (4, 4, 4))


if __name__ == "__main__":
    main()
