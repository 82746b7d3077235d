#!/usr/bin/env python
"""Probe: (a) remaining valid bigfft S=8192 chain schedules (best so far
(4,4,4,4,32) 0.124 ms); (b) balanced R2C/C2R at n=512/1024 (STFT sizes).

Run: nohup setsid python scripts/probe_r22.py > /tmp/probe_r22.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

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

    # (a) bigfft S=8192 chain schedules
    n = 1 << 20
    reb = jax.random.normal(jax.random.PRNGKey(2), (1, n), jnp.float32)
    imb = jax.random.normal(jax.random.PRNGKey(3), (1, n), jnp.float32)
    ref_o = None
    for factors in [(4, 4, 4, 4, 32), (4, 4, 4, 8, 16), (2, 4, 4, 4, 64),
                    (4, 4, 8, 64)]:
        bigfft._CHAIN_SCHEDULE[8192] = factors
        try:
            fb = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
            tc = time.time()
            ob = fb(reb, imb)
            _ = float(jnp.sum(ob[0][:1, :2]))
            comp = time.time() - tc
            if ref_o is None:
                ref_o, rel = ob, 0.0
            else:
                rel = rel_split(ob[0], ob[1], ref_o[0], ref_o[1])
            tb = _device_time(fb, (reb, imb))
            print(f"2^20 chain {factors}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"2^20 chain {factors}: FAILED {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
    bigfft._CHAIN_SCHEDULE[8192] = (4, 4, 4, 4, 32)

    # (b) balanced R2C / C2R at small n
    for n2_, rows, spec in [(512, 4096, (16, 32, (4, 4))),
                            (1024, 4096, (32, 32, (4, 8)))]:
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, n2_), jnp.float32)
        ref = np.fft.rfft(np.asarray(x), axis=-1)
        nref = float(np.sqrt((ref.real ** 2 + ref.imag ** 2).sum()))
        fc = jax.jit(lambda a: pf._rfft_rows_core(a))
        rc, ic = fc(x)
        rc.block_until_ready()
        tc_ = _device_time(fc, (x,))
        print(f"r2c {rows}x{n2_} classic: {tc_*1e3:.3f} ms", flush=True)
        pf._BALANCED_R2C[n2_] = spec
        try:
            fb = jax.jit(lambda a: pf._rfft_rows_core(a))
            rb, ib = fb(x)
            relb = float(np.sqrt(((np.asarray(rb) - ref.real) ** 2
                                  + (np.asarray(ib) - ref.imag) ** 2).sum())
                         ) / nref
            tb = _device_time(fb, (x,))
            print(f"r2c {rows}x{n2_} bal {spec}: {tb*1e3:.3f} ms "
                  f"(rel {relb:.2e})", flush=True)
        except Exception as e:
            print(f"r2c {rows}x{n2_} bal: FAILED {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
        finally:
            del pf._BALANCED_R2C[n2_]

    for n2_, rows, spec in [(512, 4096, (16, 32)), (512, 4096, (32, 16)),
                            (1024, 4096, (32, 32))]:
        rng = np.random.RandomState(0)
        xh = rng.randn(rows, n2_).astype(np.float32)
        X = np.fft.rfft(xh, axis=-1)
        Xr = jnp.asarray(X.real.astype(np.float32))
        Xi = jnp.asarray(X.imag.astype(np.float32))
        nx = float(np.sqrt((xh ** 2).sum()))
        fc = jax.jit(lambda a, b: pf._irfft_rows_core(a, b, n2_, 1.0 / n2_))
        oc = fc(Xr, Xi)
        oc.block_until_ready()
        tc_ = _device_time(fc, (Xr, Xi))
        print(f"c2r {rows}x{n2_} classic: {tc_*1e3:.3f} ms", flush=True)
        pf._BALANCED_C2R[n2_] = spec
        try:
            fb = jax.jit(lambda a, b: pf._irfft_rows_core(a, b, n2_,
                                                          1.0 / n2_))
            ob = fb(Xr, Xi)
            relb = float(np.sqrt(((np.asarray(ob) - xh) ** 2).sum())) / nx
            tb = _device_time(fb, (Xr, Xi))
            print(f"c2r {rows}x{n2_} bal {spec}: {tb*1e3:.3f} ms "
                  f"(rel {relb:.2e})", flush=True)
        except Exception as e:
            print(f"c2r {rows}x{n2_} bal {spec}: FAILED {type(e).__name__}: "
                  f"{str(e)[:180]}", flush=True)
        finally:
            del pf._BALANCED_C2R[n2_]


if __name__ == "__main__":
    main()
