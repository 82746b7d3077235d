#!/usr/bin/env python
"""Probe r37: extend the big-n1 lesson (4096 C2C peaked at n1=256,
vcheck_r35) to the real-transform pins and the 8192/16384 C2C splits.

Order: R2C/C2R 4096+8192 first (safe compiles), 16384 C2C big chains
LAST (the 16384 compile family has wedged the compile service before —
probe_r32; if it hangs, earlier rows are already logged).

Run: nohup setsid python scripts/probe_r37.py > /tmp/probe_r37.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def timed(tag, fn, args, oracle_fn=None):
    try:
        t0 = time.time()
        o = fn(*args)
        _ = float(jnp.sum(o[0].ravel()[:8]))
        comp = time.time() - t0
        if oracle_fn is not None:
            ok, rel = oracle_fn(o)
            if not ok:
                print(f"{tag}: WRONG rel={rel:.1e}", flush=True)
                return
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms (compile {comp:.0f}s)", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r37 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---------- R2C ----------
    for n, rows, cands in [
        (4096, 4096, [(256, 16, (4, 8, 8)), (128, 32, (4, 8, 4))]),
        (8192, 2048, [(256, 32, (4, 8, 8))]),
    ]:
        x = jax.random.normal(k0, (rows, n), jnp.float32)
        ox = np.fft.rfft(np.asarray(x[:2]), axis=-1)

        def r2c_oracle(o, _ox=ox):
            g = np.asarray(o[0][:2]) + 1j * np.asarray(o[1][:2])
            rel = np.linalg.norm(g - _ox) / np.linalg.norm(_ox)
            return rel < 1e-5, rel

        base = dict(pf._BALANCED_R2C)
        fn0 = jax.jit(lambda a, _n=n: pf._rfft_rows_core(a))
        timed(f"R2C {n} pinned{base.get(n)}", fn0, (x,), r2c_oracle)
        for cand in cands:
            pf._BALANCED_R2C[n] = cand
            fnc = jax.jit(lambda a, _c=cand: pf._rfft_rows_core(a))
            timed(f"R2C {n} {cand}", fnc, (x,), r2c_oracle)
        pf._BALANCED_R2C.clear()
        pf._BALANCED_R2C.update(base)

    # ---------- C2R ----------
    for n, rows, cands in [
        (4096, 4096, [(256, 16, (4, 8, 8)), (128, 32, (4, 8, 4))]),
        (8192, 2048, [(256, 32, (4, 8, 8))]),
    ]:
        bins = n // 2 + 1
        Xr = jax.random.normal(k0, (rows, bins), jnp.float32)
        Xi = jax.random.normal(k1, (rows, bins), jnp.float32)
        oz = np.fft.irfft(np.asarray(Xr[:2]) + 1j * np.asarray(Xi[:2]),
                          n=n, axis=-1)

        def c2r_oracle(o, _oz=oz):
            g = np.asarray(o[0][:2])
            rel = np.linalg.norm(g - _oz) / np.linalg.norm(_oz)
            return rel < 1e-5, rel

        base = dict(pf._BALANCED_C2R)
        fn0 = jax.jit(lambda a, b, _n=n: (pf._irfft_rows_core(
            a, b, _n, 1.0 / _n),))
        timed(f"C2R {n} pinned{base.get(n)}", fn0, (Xr, Xi), c2r_oracle)
        for cand in cands:
            pf._BALANCED_C2R[n] = cand
            fnc = jax.jit(lambda a, b, _c=cand, _n=n: (pf._irfft_rows_core(
                a, b, _n, 1.0 / _n),))
            timed(f"C2R {n} {cand}", fnc, (Xr, Xi), c2r_oracle)
        pf._BALANCED_C2R.clear()
        pf._BALANCED_C2R.update(base)

    # ---------- C2C 8192/16384 bigger-n1 (riskier compiles LAST) ----------
    for n, rows, cands in [
        (8192, 1024, [(512, 16, (4, 8, 4, 4))]),
        (16384, 1024, [(512, 32, (4, 8, 4, 4)), (512, 32, (8, 8, 8))]),
    ]:
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        oc = np.fft.fft(np.asarray(re[:2]) + 1j * np.asarray(im[:2]))

        def c2c_oracle(o, _oc=oc):
            g = np.asarray(o[0][:2]) + 1j * np.asarray(o[1][:2])
            rel = np.linalg.norm(g - _oc) / np.linalg.norm(_oc)
            return rel < 1e-5, rel

        base = dict(pf._BALANCED)
        fn0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        timed(f"C2C {n} pinned{base.get(n)}", fn0, (re, im), c2c_oracle)
        for cand in cands:
            pf._BALANCED[n] = cand
            fnc = jax.jit(lambda a, b, _c=cand: pf.fft_batched_split(
                a, b, -1))
            timed(f"C2C {n} {cand}", fnc, (re, im), c2c_oracle)
        pf._BALANCED.clear()
        pf._BALANCED.update(base)
    print("probe_r37 done", flush=True)


if __name__ == "__main__":
    main()
