#!/usr/bin/env python
"""Probe r40: big-kernel outer twiddle — direct [S,128] in-register table
(1M transcendental pairs at 2^20) vs the factored two-small-tables form
(24K entries + one extra broadcast complex multiply); TW_FORM in bigfft.

Run: nohup setsid python scripts/probe_r40.py > /tmp/probe_r40.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import bigfft, fourstep
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r40 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def big(n):
        re = jax.random.normal(k0, (n,), jnp.float32)
        im = jax.random.normal(k1, (n,), jnp.float32)
        fn = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
        return f"big 2^{n.bit_length()-1}", fn, (re, im)

    results = {}
    for form in ("factored", "direct"):
        bigfft.TW_FORM = form
        for n in (1 << 20, 1 << 21, 1 << 19, 1 << 15):
            tag, fn, args = big(n)
            try:
                t0 = time.time()
                out = fn(*args)
                g = np.asarray(out[0])[:4] + 1j * np.asarray(out[1])[:4]
                oracle = np.fft.fft(np.asarray(args[0]).astype(np.float64)
                                    + 1j * np.asarray(args[1]))[:4]
                rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
                if rel > 5e-5:
                    print(f"{form} {tag}: WRONG rel={rel:.1e}", flush=True)
                    continue
                t = _device_time(fn, args)
                results[(form, tag)] = t
                print(f"{form} {tag}: {t*1e3:.3f} ms rel={rel:.1e} "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"{form} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    # four-step outer twiddle form (rows_t kernels)
    def fs(n, rows):
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        fn = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1))
        return f"fourstep 2^{n.bit_length()-1}x{rows}", fn, (re, im)

    for form in ("factored", "direct"):
        pf.OUTER_TW_FORM = form
        for n, rows in ((1 << 22, 4), (1 << 21, 8)):
            tag, fn, args = fs(n, rows)
            try:
                t0 = time.time()
                out = fn(*args)
                g = np.asarray(out[0])[0, :4] + 1j * np.asarray(out[1])[0, :4]
                oracle = np.fft.fft(np.asarray(args[0][0]).astype(np.float64)
                                    + 1j * np.asarray(args[1][0]))[:4]
                rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
                if rel > 5e-5:
                    print(f"outer-{form} {tag}: WRONG rel={rel:.1e}",
                          flush=True)
                    continue
                t = _device_time(fn, args)
                results[(f"outer-{form}", tag)] = t
                print(f"outer-{form} {tag}: {t*1e3:.3f} ms rel={rel:.1e} "
                      f"(wall {time.time()-t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"outer-{form} {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)

    print("\nsummary (factored vs direct):", flush=True)
    for (form, tag), t in sorted(results.items()):
        if form in ("factored", "outer-factored"):
            td = results.get((form.replace("factored", "direct"), tag))
            if td:
                print(f"  {tag}: factored {t*1e3:.3f} vs direct "
                      f"{td*1e3:.3f} ({td/t:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r40 done", flush=True)
