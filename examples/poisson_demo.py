"""Spectral Poisson solve demo: laplacian(u) = f on a periodic 2-D box."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fft_wgpu_tpu.models.poisson import solve_poisson


def main():
    n = 256
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u_true = np.sin(3 * X) * np.cos(Y)
    f = -(9 + 1) * u_true  # laplacian of u_true

    u = np.asarray(solve_poisson(f.astype(np.float32)))
    err = np.linalg.norm(u - u_true) / np.linalg.norm(u_true)
    print(f"Poisson {n}x{n}: rel-L2 error vs analytic = {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
