#!/usr/bin/env python
"""TPU oracle check of the newly pinned row schedules (probe_r28):
2048 balanced (32,64)+(4,8) and 4096 balanced (64,64)+(4,8,2).

Run from repo root: timeout 600 python scripts/vcheck_r28.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from fft_wgpu_tpu.ops import pallas_fft


def check(n, batch=8):
    rng = np.random.default_rng(42)
    x = (rng.standard_normal((batch, n)) +
         1j * rng.standard_normal((batch, n))).astype(np.complex64)
    re = jax.device_put(np.ascontiguousarray(x.real, np.float32))
    im = jax.device_put(np.ascontiguousarray(x.imag, np.float32))
    for sign, scale, oracle in [(-1, None, np.fft.fft(x)),
                                (1, 1.0 / n, np.fft.ifft(x))]:
        yr, yi = pallas_fft.fft_batched_split(re, im, sign=sign, scale=scale)
        y = np.asarray(yr) + 1j * np.asarray(yi)
        rel = np.linalg.norm(y - oracle) / np.linalg.norm(oracle)
        print(f"n={n} sign={sign:+d}: rel {rel:.2e}", flush=True)
        assert rel < 5e-6, (n, sign, rel)


for n in (2048, 4096):
    check(n)
print("OK", flush=True)
