#!/usr/bin/env python
"""TPU validation queue (post-outage): everything added while the tunnel
was down + the paths the review flagged as hardware-untested.

1. fft2 with 8192 axes (rows_t shares _BALANCED: the (256,32) pin now
   routes the transposed kernel — review finding).
2. NUFFT 1/2/3 on the TPU backend (XLA scatter/gather compile + oracle).
3. MDCT TDAC + hilbert2 + scipy-backend dispatch on TPU.

Run: nohup setsid python scripts/vcheck_r33.py > /tmp/vcheck_r33.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time


def main():
    import fft_wgpu_tpu as ftt
    from fft_wgpu_tpu.ops import pallas_fft as pf
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # ---- (1) fft2 through the transposed-rows kernels ----
    # numerics at a size small enough for a host oracle, with the 8192
    # row pin FORCED so the (256,32) chain runs through rows_t; then
    # timing-only at full 4096/8192 (finiteness checked)
    ref = jax.random.normal(k0, (8192, 8), jnp.float32)
    imf = jax.random.normal(k1, (8192, 8), jnp.float32)
    rr, ii = jax.jit(lambda a, b: pf.fft_rows_transposed_split(
        a.T, b.T, -1, None))(ref, imf)
    got = (np.asarray(rr) + 1j * np.asarray(ii)).T
    want = np.fft.fft(np.asarray(ref).T + 1j * np.asarray(imf).T)
    print(f"rows_t 8192 (256,32): rel "
          f"{np.linalg.norm(got-want)/np.linalg.norm(want):.2e}", flush=True)
    for n in (4096, 8192):
        re = jax.random.normal(k0, (n, n), jnp.float32)
        im = jax.random.normal(k1, (n, n), jnp.float32)
        fn = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
        t0 = time.time()
        rr, ii = fn(re, im)
        sm = float(jnp.sum(jnp.abs(rr.ravel()[:1024])))
        assert np.isfinite(sm)
        print(f"fft2 {n} compile {time.time()-t0:.0f}s", flush=True)
        t = _device_time(fn, (re, im))
        print(f"fft2 {n}x{n}: {t*1e3:.3f} ms", flush=True)
        del re, im, rr, ii

    # ---- (2) NUFFT on TPU ----
    rng = np.random.default_rng(0)
    M, n = 512, 128
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    k = np.arange(-(n // 2), n - n // 2)
    want1 = np.exp(1j * k[:, None] * x[None, :].astype(np.float64)) @ c.astype(np.complex128)
    t0 = time.time()
    got1 = np.asarray(ftt.device_get_complex(ftt.nufft1d1(x, c, n)))
    print(f"nufft1d1: rel {np.linalg.norm(got1-want1)/np.linalg.norm(want1):.2e}"
          f" (compile {time.time()-t0:.0f}s)", flush=True)
    f = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    want2 = np.exp(-1j * x[:, None].astype(np.float64) * k[None, :]) @ f.astype(np.complex128)
    got2 = np.asarray(ftt.device_get_complex(ftt.nufft1d2(x, f)))
    print(f"nufft1d2: rel {np.linalg.norm(got2-want2)/np.linalg.norm(want2):.2e}",
          flush=True)
    s = rng.uniform(-40, 25, 64).astype(np.float32)
    want3 = np.exp(1j * s[:, None].astype(np.float64) * x[None, :].astype(np.float64)) @ c.astype(np.complex128)
    got3 = np.asarray(ftt.device_get_complex(ftt.nufft1d3(x, c, s)))
    print(f"nufft1d3: rel {np.linalg.norm(got3-want3)/np.linalg.norm(want3):.2e}",
          flush=True)

    # ---- (3) MDCT + hilbert2 + backend ----
    xs = rng.standard_normal((4, 64 * 16)).astype(np.float32)
    y = np.asarray(ftt.imdct(ftt.mdct(xs, 64)))
    rel = (np.linalg.norm(y[:, 64:-64] - xs[:, 64:-64])
           / np.linalg.norm(xs[:, 64:-64]))
    print(f"mdct tdac: rel {rel:.2e}", flush=True)
    xh = rng.standard_normal((64, 128)).astype(np.float32)
    import scipy.signal as ssig
    gh = np.asarray(ftt.device_get_complex(ftt.hilbert2(xh)))
    wh = ssig.hilbert2(xh)
    print(f"hilbert2: rel {np.linalg.norm(gh-wh)/np.linalg.norm(wh):.2e}",
          flush=True)
    import scipy.fft as sf
    import fft_wgpu_tpu.scipy_backend as be
    with sf.set_backend(be):
        Z = sf.rfft(xh)
    print(f"scipy backend on TPU: rel "
          f"{np.linalg.norm(Z-np.fft.rfft(xh,axis=-1))/np.linalg.norm(Z):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
    print("vcheck_r33 done", flush=True)
