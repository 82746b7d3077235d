#!/usr/bin/env python
"""Round-4 probe F: general-n R2C kernel on hardware through production
routing (rfft_last_split -> rfft_rows_general_split for composite
non-pow2 n, incl. ODD n).

Run: nohup setsid python scripts/vcheck_r66.py > /tmp/vcheck_r66.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops.rfft import rfft_last_split


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    for n, rows in [(1000, 2048), (4095, 1024), (1005, 1024)]:
        try:
            signal.alarm(900)
            x = rng.standard_normal((rows, n)).astype(np.float32)
            f = jax.jit(lambda v: rfft_last_split(v, None))
            R, I = f(jnp.asarray(x))
            got = np.asarray(R) + 1j * np.asarray(I)
            want = np.fft.rfft(x, axis=-1)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            t = _device_time(f, (jnp.asarray(x),))
            signal.alarm(0)
            print(f"rfft n={n} x{rows}: {t*1e3:.3f} ms rel={rel:.2e}",
                  flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"rfft n={n}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("vcheck_r66 done", flush=True)


if __name__ == "__main__":
    main()
