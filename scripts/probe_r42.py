#!/usr/bin/env python
"""Probe r42: fused single-round-trip fft2 plane kernel on hardware.

Measures the fused [A, B]-plane kernel (fft2_fused_split) against the
two-pass transposed-rows form, and the 3-D fftn path (fused trailing
plane + one axis pass = 2 HBM round trips) against the old 3-pass form.

Run: nohup setsid python scripts/probe_r42.py > /tmp/probe_r42.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import nd, pallas_fft as pf


def tcase(tag, fn, args, chk=None):
    try:
        t0 = time.time()
        out = fn(*args)
        if chk is not None:
            rel = chk(out)
            if rel > 5e-6:
                print(f"{tag}: WRONG rel={rel:.1e}", flush=True)
                return None
        else:
            rel = float("nan")
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms rel={rel:.1e} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return t
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r42 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- batched fft2 planes: fused vs two-pass ----
    for rows, A, B in ((256, 256, 256), (32, 512, 512), (8, 1024, 1024),
                       (128, 128, 128)):
        re = jax.random.normal(k0, (rows, A, B), jnp.float32)
        im = jax.random.normal(k1, (rows, A, B), jnp.float32)
        z = np.asarray(re[:1]) + 1j * np.asarray(im[:1])
        oracle = np.fft.fft2(z)

        def chk(out):
            g = np.asarray(out[0][:1]) + 1j * np.asarray(out[1][:1])
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        fn_f = jax.jit(lambda a, b: pf.fft2_fused_split(a, b, -1))
        fn_2 = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
        tf = tcase(f"fused {rows}x{A}x{B}", fn_f, (re, im), chk)
        t2 = tcase(f"2pass {rows}x{A}x{B}", fn_2, (re, im), chk)
        if tf and t2:
            print(f"  -> fused {t2/tf:.2f}x", flush=True)

    # ---- 3-D fftn through the production router: fused vs old ----
    for n in (256, 512):
        re = jax.random.normal(k0, (n, n, n), jnp.float32)
        im = jax.random.normal(k1, (n, n, n), jnp.float32)

        def run3d(a, b):
            return nd.fftn_split(a, b, (0, 1, 2), -1, None, "auto")

        fn = jax.jit(run3d)
        # NOTE: these rows are TIMING-ONLY (no in-loop oracle — a full
        # 3-D numpy oracle at 512^3 is ~2 GiB); correctness of the same
        # route is asserted below at 128^3/256^3 and in tests/.

        t_new = tcase(f"fftn {n}^3 (fused plane route)", fn, (re, im))
        old = pf._FFT2F_MAX_ELEMS
        pf._FFT2F_MAX_ELEMS = 0
        jax.clear_caches()
        fn2 = jax.jit(run3d)
        t_old = tcase(f"fftn {n}^3 (old 3-pass route)", fn2, (re, im))
        pf._FFT2F_MAX_ELEMS = old
        jax.clear_caches()
        if t_new and t_old:
            print(f"  -> fused route {t_old/t_new:.2f}x", flush=True)

    # correctness of the full 3-D route vs numpy (128^3 rides the fused
    # plane, 256^3 the fused plane + ax0 pass)
    for n in (128, 256):
        re = jax.random.normal(k0, (n, n, n), jnp.float32)
        im = jax.random.normal(k1, (n, n, n), jnp.float32)
        fn = jax.jit(lambda a, b: nd.fftn_split(a, b, (0, 1, 2), -1,
                                                None, "auto"))
        out = fn(re, im)
        g = np.asarray(out[0]) + 1j * np.asarray(out[1])
        want = np.fft.fftn(np.asarray(re) + 1j * np.asarray(im))
        rel = np.linalg.norm(g - want) / np.linalg.norm(want)
        print(f"fftn {n}^3 oracle rel={rel:.1e}", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r42 done", flush=True)
