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


class TestPlanClasses:
    def test_czt_class_matches_scipy(self):
        rng = np.random.default_rng(5)
        x = (rng.standard_normal((3, 60)) + 1j * rng.standard_normal((3, 60))
             ).astype(np.complex64)
        w = np.exp(-2j * np.pi / 97) * 1.004
        t = ftt.CZT(60, m=97, w=w, a=1.1 + 0j)
        got = np.asarray(t(x))
        want = scipy_signal.CZT(60, m=97, w=w, a=1.1 + 0j)(
            x.astype(np.complex128))
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5
        np.testing.assert_allclose(t.points(),
                                   scipy_signal.czt_points(97, w, 1.1 + 0j),
                                   rtol=1e-12)

    def test_czt_class_length_check(self):
        t = ftt.CZT(32)
        with pytest.raises(ValueError):
            t(np.zeros(33, np.float32))

    def test_zoom_fft_class_matches_scipy(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal(128).astype(np.float32)
        t = ftt.ZoomFFT(128, [0.1, 0.4], m=77, fs=2.0)
        got = np.asarray(t(x))
        want = scipy_signal.ZoomFFT(128, [0.1, 0.4], m=77, fs=2.0)(
            x.astype(np.float64))
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5

    def test_czt_points_default(self):
        np.testing.assert_allclose(ftt.czt_points(16),
                                   scipy_signal.czt_points(16), rtol=1e-12,
                                   atol=1e-12)
