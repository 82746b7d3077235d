"""Spectral calculus vs analytic derivatives."""

import numpy as np

from fft_wgpu_tpu.ops.spectral import (
    spectral_derivative,
    spectral_gradient,
    spectral_laplacian,
)


def _grid(n):
    return np.linspace(0, 2 * np.pi, n, endpoint=False)


def test_first_derivative():
    x = _grid(128)
    f = np.sin(3 * x).astype(np.float32)
    want = 3 * np.cos(3 * x)
    got = np.asarray(spectral_derivative(f))
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_second_derivative():
    x = _grid(256)
    f = np.cos(5 * x).astype(np.float32)
    want = -25 * np.cos(5 * x)
    got = np.asarray(spectral_derivative(f, order=2))
    # k^2 amplification of f32 roundoff: order-2 tolerance is wider
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-4


def test_gradient_2d():
    x = _grid(64)
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = (np.sin(2 * X) * np.cos(Y)).astype(np.float32)
    gx, gy = spectral_gradient(f)
    assert np.linalg.norm(np.asarray(gx) - 2 * np.cos(2 * X) * np.cos(Y)) < 1e-3
    assert np.linalg.norm(np.asarray(gy) + np.sin(2 * X) * np.sin(Y)) < 1e-3


def test_laplacian_matches_sum_of_second_derivatives():
    rng = np.random.default_rng(0)
    x = _grid(32)
    X, Y = np.meshgrid(x, x, indexing="ij")
    f = (np.sin(X) * np.cos(3 * Y)).astype(np.float32)
    want = -(1 + 9) * f
    got = np.asarray(spectral_laplacian(f))
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-4
