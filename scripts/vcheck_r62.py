#!/usr/bin/env python
"""Round-4 probe C: the generic two-factor composite-n kernel + fused
CZT on hardware, through PRODUCTION routing (public fft / czt paths).

Expected: n=4097 x 1024 drops from the fused-Bluestein 1.552 ms to a
single-pass ~0.3 ms; smooth odd n (1000) beats the XLA mixed-radix
recursion.  Run:
nohup setsid python scripts/vcheck_r62.py > /tmp/vcheck_r62.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops.stockham import fft_last_axis


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    def run(tag, fn, args, want, budget=900):
        try:
            signal.alarm(budget)
            f = jax.jit(fn)
            o = f(*args)
            got = np.asarray(o[0]) + 1j * np.asarray(o[1])
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            t = _device_time(f, args)
            signal.alarm(0)
            print(f"{tag}: {t*1e3:.3f} ms rel={rel:.2e}", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # general kernel through the public routing (stockham.fft_last_axis)
    for n, b in [(4097, 1024), (4093, 1024), (1000, 2048), (771, 2048),
                 (4095, 1024)]:
        x = rng.standard_normal((b, n)).astype(np.float32)
        y = rng.standard_normal((b, n)).astype(np.float32)
        run(f"fft n={n} x{b} (routing: general kernel if composite)",
            lambda a, c: fft_last_axis(a, c, -1),
            (jnp.asarray(x), jnp.asarray(y)),
            np.fft.fft(x + 1j * y, axis=-1))

    # fused CZT through the public czt (plan-style, custom w/a)
    import fft_wgpu_tpu as ftt
    import scipy.signal as sig

    x = (rng.standard_normal((256, 2000))
         + 1j * rng.standard_normal((256, 2000))).astype(np.complex64)
    try:
        signal.alarm(900)
        got = np.asarray(jax.device_get(ftt.czt(x, m=1500)))
        ref = sig.czt(np.asarray(x, np.complex128), m=1500)
        rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
        signal.alarm(0)
        print(f"czt 2000->1500 x256 (fused path): rel={rel:.2e}",
              flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"czt: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    print("vcheck_r62 done", flush=True)


if __name__ == "__main__":
    main()
