"""Inverse FFT example with fused 1/N + oracle check.

Parity with the reference's examples/basic_inverse.rs (E2, SURVEY §2):
inverse transform of the 2500x512 batch, verified against the CPU oracle
within 1e-5 (the reference asserts max-abs < 1e-5 vs rustfft,
basic_inverse.rs:249-253; we use relative L2 vs numpy).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import fft_wgpu_tpu as ftt


def main():
    batch, n = 2500, 512
    rng = np.random.default_rng(1)
    x = (rng.standard_normal((batch, n)) + 1j * rng.standard_normal((batch, n))).astype(
        np.complex64
    )

    inv = ftt.Inverse(n)  # reference-shaped API
    y = ftt.device_get_complex(inv.proc(x))
    ref = np.fft.ifft(x, axis=-1)
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    print(f"inverse {batch}x{n}: rel-L2 vs numpy = {err:.2e}")
    assert err < 1e-5


if __name__ == "__main__":
    main()
