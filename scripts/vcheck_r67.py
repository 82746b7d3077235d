#!/usr/bin/env python
"""Round-4 probe G: the padded-form conversions (welch/csd, oaconvolve)
on hardware through the public API — correctness + device time.

Run: nohup setsid python scripts/vcheck_r67.py > /tmp/vcheck_r67.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import numpy as np
import scipy.signal as sig

import fft_wgpu_tpu as ftt


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    try:
        signal.alarm(900)
        x = rng.standard_normal(1 << 22).astype(np.float32)
        f1, p1 = ftt.welch(x, nperseg=4096)
        f2, p2 = sig.welch(x, nperseg=4096)
        rel = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
        signal.alarm(0)
        print(f"welch 2^22 samples nperseg=4096 (padded spectra): "
              f"rel={rel:.2e}", flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"welch: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    try:
        signal.alarm(900)
        a = rng.standard_normal(1 << 20).astype(np.float32)
        b = rng.standard_normal(257).astype(np.float32)
        got = np.asarray(ftt.oaconvolve(a, b, mode="same"))
        want = sig.oaconvolve(a, b, mode="same")
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        signal.alarm(0)
        print(f"oaconvolve 2^20 x 257 (padded R2C/C2R): rel={rel:.2e}",
              flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"oaconvolve: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    print("vcheck_r67 done", flush=True)


if __name__ == "__main__":
    main()
