"""Chirp-Z / zoom FFT vs scipy.signal oracles."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import fft_wgpu_tpu as ftt


def crand(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def test_czt_default_equals_fft(rng, assert_close):
    x = crand(rng, 3, 100)
    assert_close(ftt.czt(x), np.fft.fft(x, axis=-1), tol=2e-5)


def test_czt_matches_scipy(rng, assert_close):
    x = crand(rng, 128)
    m, w, a = 75, np.exp(-2j * np.pi * 0.0037), 1.1 * np.exp(0.3j)
    assert_close(ftt.czt(x, m=m, w=w, a=a), scipy_signal.czt(x, m=m, w=w, a=a), tol=2e-5)


def test_zoom_fft_matches_scipy(rng, assert_close):
    x = rng.standard_normal(256).astype(np.float32)
    got = ftt.zoom_fft(x, [0.1, 0.4], m=64)
    want = scipy_signal.zoom_fft(x, [0.1, 0.4], m=64)
    assert_close(got, want, tol=2e-5)
