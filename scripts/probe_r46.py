#!/usr/bin/env python
"""Round-3 probe C/D/E (VERDICT items 1, 2, 3, 4).

C. bigfft 2^20 sublane-chain candidates, including MXU-heavy two-factor
   schedules never tried ((64,128)/(128,64): all dots full-rate, zero VPU
   butterflies, one twiddle layer) — the chain stages run 3.6x over the
   MAC model and the open question is whether the cost is VPU throughput
   or per-stage twiddle/relayout structure.
D. Cross-tile pipe2 (bt=256, two halves — probe_r45: 4096 0.621->0.611)
   at the other balanced sizes.
E. 16384 real transforms: balanced R2C/C2R candidate splits (currently
   classic: 0.955 / 1.227 ms per BENCHMARKS.md).

Run: nohup setsid python scripts/probe_r46.py > /tmp/probe_r46.out 2>&1 &
"""
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import bigfft
from fft_wgpu_tpu.ops import pallas_fft as pf
from probe_r45 import rows_bal_pipe, rel_split  # noqa: E402


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # ---- C. bigfft 2^20 chain candidates ----
    n = 1 << 20
    S = n // 128
    reb = jax.random.normal(jax.random.PRNGKey(2), (1, n), jnp.float32)
    imb = jax.random.normal(jax.random.PRNGKey(3), (1, n), jnp.float32)
    ref_o = None
    orig = dict(bigfft._CHAIN_SCHEDULE)
    for factors in [None, (64, 128), (128, 64), (2, 8, 8, 64),
                    (32, 4, 64), (4, 4, 8, 64)]:
        tag = "default" if factors is None else str(factors)
        if factors is not None:
            bigfft._CHAIN_SCHEDULE[S] = factors
        else:
            bigfft._CHAIN_SCHEDULE.clear()
            bigfft._CHAIN_SCHEDULE.update(orig)
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
            print(f"C 2^20 chain {tag}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"C 2^20 chain {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            bigfft._CHAIN_SCHEDULE.clear()
            bigfft._CHAIN_SCHEDULE.update(orig)

    # ---- D. pipe2 at other balanced sizes ----
    for n2_, rows in [(512, 2500), (1024, 2048), (2048, 2048),
                      (8192, 1024), (16384, 1024)]:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n2_),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n2_),
                               jnp.float32)
        try:
            f0 = jax.jit(lambda a, b: pf.fft_batched_split(
                a, b, -1, schedule="balanced"))
            o0 = f0(re, im)
            _ = float(jnp.sum(o0[0][:2, :2]))
            t0 = _device_time(f0, (re, im))
            fb = jax.jit(lambda a, b: rows_bal_pipe(a, b, -1, 256, 2,
                                                    "cdcd"))
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"D n={n2_} x {rows}: prod {t0*1e3:.3f} -> pipe2 "
                  f"{tb*1e3:.3f} ms (rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"D n={n2_}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # ---- E. 16384 balanced real transforms ----
    n3, rows3 = 16384, 1024
    xr = jax.random.normal(jax.random.PRNGKey(5), (rows3, n3), jnp.float32)
    fr0 = jax.jit(lambda a: pf.rfft_rows_split(a))
    o0 = fr0(xr)
    _ = float(jnp.sum(o0[0][:2, :2]))
    t0 = _device_time(fr0, (xr,))
    print(f"E prod R2C 16384 (classic): {t0*1e3:.3f} ms", flush=True)
    for ent in [(256, 64, (4, 8, 8)), (128, 128, (4, 8, 4))]:
        pf._BALANCED_R2C[n3] = ent
        try:
            signal.alarm(900)
            fb = jax.jit(lambda a: pf._rfft_rows_core(a))
            tc = time.time()
            ob = fb(xr)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (xr,))
            signal.alarm(0)
            print(f"E R2C 16384 bal {ent[:2]}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"E R2C 16384 bal {ent[:2]}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            pf._BALANCED_R2C.pop(n3, None)

    mp = n3 // 2 + 1
    Xr = jax.random.normal(jax.random.PRNGKey(6), (rows3, mp), jnp.float32)
    Xi = jax.random.normal(jax.random.PRNGKey(7), (rows3, mp), jnp.float32)
    fc0 = jax.jit(lambda a, b: pf.irfft_rows_split(a, b, n3))
    oc0 = fc0(Xr, Xi)
    _ = float(jnp.sum(oc0[:2, :2]))
    tc0 = _device_time(fc0, (Xr, Xi))
    print(f"E prod C2R 16384 (classic): {tc0*1e3:.3f} ms", flush=True)
    for ent in [(256, 64, (4, 8, 8)), (128, 128, (4, 8, 4))]:
        pf._BALANCED_C2R[n3] = ent
        try:
            signal.alarm(900)
            fb = jax.jit(lambda a, b: pf._irfft_rows_core(a, b, n3))
            tc = time.time()
            ob = fb(Xr, Xi)
            _ = float(jnp.sum(ob[:2, :2]))
            comp = time.time() - tc
            rel = float(jax.jit(lambda a, c: jnp.sqrt(
                jnp.sum((a - c) ** 2) / jnp.sum(c ** 2)))(ob, oc0))
            tb = _device_time(fb, (Xr, Xi))
            signal.alarm(0)
            print(f"E C2R 16384 bal {ent[:2]}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"E C2R 16384 bal {ent[:2]}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            pf._BALANCED_C2R.pop(n3, None)


if __name__ == "__main__":
    main()
