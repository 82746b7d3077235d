#!/usr/bin/env python
"""vcheck r35b: the new 4096 pin (256,16)+(4,8,8) through every affected
production path — rows_t (fft2/four-step pass 2), fft2 4096^2, four-step
2^22 x 4 — oracle + timing.

Run: nohup setsid python scripts/vcheck_r35b.py > /tmp/vcheck_r35b.out 2>&1 &
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import fourstep


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("vcheck_r35b start (pin:", pf._BALANCED[4096], ")", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    # rows_t at 4096 (oracle at thin batch, time at full)
    re = jax.random.normal(k0, (4096, 4096), jnp.float32)
    im = jax.random.normal(k1, (4096, 4096), jnp.float32)
    rt = jax.jit(lambda a, b: pf.fft_rows_transposed_split(a, b, -1, None))
    rr, ii = rt(re[:8], im[:8])  # [8, n] rows in -> [n, 8] out
    got = np.asarray(rr) + 1j * np.asarray(ii)
    oracle = np.fft.fft(np.asarray(re[:8]) + 1j * np.asarray(im[:8]), axis=-1).T
    rel = np.linalg.norm(got - oracle) / np.linalg.norm(oracle)
    print(f"rows_t 4096 rel: {rel:.1e}", flush=True)
    assert rel < 1e-5
    t = _device_time(rt, (re, im))
    print(f"rows_t 4096x4096: {t*1e3:.3f} ms", flush=True)

    # fft2 4096^2
    f2 = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
    sr, si = f2(re[:128, :128], im[:128, :128])  # small oracle... separate trace
    g2 = np.asarray(sr) + 1j * np.asarray(si)
    o2 = np.fft.fft2(np.asarray(re[:128, :128]) + 1j * np.asarray(im[:128, :128]))
    rel2 = np.linalg.norm(g2 - o2) / np.linalg.norm(o2)
    print(f"fft2 128 rel: {rel2:.1e}", flush=True)
    t2 = _device_time(f2, (re, im))
    print(f"fft2 4096^2: {t2*1e3:.3f} ms", flush=True)

    # four-step 2^22 x 4
    n = 1 << 22
    r4 = jax.random.normal(k0, (4, n), jnp.float32)
    i4 = jax.random.normal(k1, (4, n), jnp.float32)
    fs = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1, None))
    fr, fi = fs(r4[:1], i4[:1])
    gf = np.asarray(fr)[0] + 1j * np.asarray(fi)[0]
    of = np.fft.fft(np.asarray(r4[0]) + 1j * np.asarray(i4[0]))
    rel4 = np.linalg.norm(gf - of) / np.linalg.norm(of)
    print(f"fourstep 2^22 rel: {rel4:.1e}", flush=True)
    assert rel4 < 1e-5
    t4 = _device_time(fs, (r4, i4))
    print(f"fourstep 2^22 x4: {t4*1e3:.3f} ms", flush=True)
    print("vcheck_r35b done", flush=True)


if __name__ == "__main__":
    main()
