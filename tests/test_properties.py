"""FFT property tests: shift theorem, convolution theorem, conjugate
symmetry — the stronger regime SURVEY §4 calls for (the reference has
constant-input smoke tests only)."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def crand(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def test_time_shift_theorem(rng, assert_close):
    n = 512
    x = crand(rng, n)
    s = 37
    shifted = np.roll(x, s)
    X = np.asarray(ftt.fft(x))
    Xs = np.asarray(ftt.fft(shifted))
    k = np.arange(n)
    assert_close(Xs, X * np.exp(-2j * np.pi * k * s / n), tol=2e-5)


def test_convolution_theorem(rng, assert_close):
    n = 256
    a, b = crand(rng, n), crand(rng, n)
    circ = np.fft.ifft(np.fft.fft(a) * np.fft.fft(b))
    got = np.asarray(ftt.ifft(np.asarray(ftt.fft(a)) * np.asarray(ftt.fft(b))))
    assert_close(got, circ, tol=2e-5)


def test_conjugate_symmetry_real_input(rng):
    n = 256
    x = rng.standard_normal(n).astype(np.float32)
    X = np.asarray(ftt.fft(x))
    np.testing.assert_allclose(X[1:], np.conj(X[1:][::-1]), atol=1e-3)


def test_random_shapes_sweep(rng, assert_close):
    for _ in range(10):
        nd = rng.integers(1, 4)
        shape = tuple(int(rng.integers(1, 5)) * 2 for _ in range(nd - 1)) + (
            int(2 ** rng.integers(3, 11)),
        )
        x = crand(rng, *shape)
        assert_close(ftt.fft(x), np.fft.fft(x, axis=-1), what=f"{shape}")


def test_linearity_under_jit(rng, assert_close):
    import jax

    n = 128
    x, y = crand(rng, n), crand(rng, n)
    f = jax.jit(lambda a, b: ftt.fft(a) + 2.0 * ftt.fft(b))
    assert_close(f(x, y), np.fft.fft(x) + 2.0 * np.fft.fft(y))
