"""Wigner-Ville distribution vs a direct O(n^2) oracle + properties."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def _direct_wvd(x, window=None):
    """Symmetric-sum definition, f64; window is the centered PWVD lag
    taper (center sample = lag 0)."""
    x = np.asarray(x, complex)
    n = len(x)
    W = np.zeros((n, n))
    mid = len(window) // 2 if window is not None else 0
    for t in range(n):
        L = min(t, n - 1 - t)
        for k in range(n):
            acc = 0.0 + 0.0j
            for tau in range(-L, L + 1):
                r = x[t + tau] * np.conj(x[t - tau])
                if window is not None:
                    idx = mid + abs(tau)
                    r *= window[idx] if idx < len(window) else 0.0
                acc += r * np.exp(-2j * np.pi * k * tau / n)
            W[t, k] = acc.real
    return W


def _chirp(n=64):
    t = np.arange(n)
    ph = 2 * np.pi * (0.05 * t + 0.15 / n * t * t / 2)
    return np.exp(1j * ph).astype(np.complex64)


class TestOracle:
    def test_vs_direct(self):
        rng = np.random.default_rng(0)
        x = (rng.standard_normal(48) + 1j * rng.standard_normal(48)
             ).astype(np.complex64)
        f, W = ftt.wigner_ville(x)
        W0 = _direct_wvd(x)
        rel = np.linalg.norm(np.asarray(W) - W0) / np.linalg.norm(W0)
        assert rel < 1e-5, rel
        np.testing.assert_allclose(f, np.arange(48) / 96.0)

    def test_pseudo_wvd_window(self):
        rng = np.random.default_rng(1)
        x = (rng.standard_normal(32) + 1j * rng.standard_normal(32)
             ).astype(np.complex64)
        w = np.hanning(21)  # centered lag taper to +-10, w[10] = max
        _, W = ftt.wigner_ville(x, window=w)
        W0 = _direct_wvd(x, window=w)
        rel = np.linalg.norm(np.asarray(W) - W0) / np.linalg.norm(W0)
        assert rel < 1e-5, rel

    def test_pseudo_wvd_preserves_marginal_scale(self):
        # the centered taper weights lag 0 by window[center] (~1), so
        # the frequency marginal keeps its meaning
        x = _chirp(64)
        w = np.hanning(33)
        _, W = ftt.wigner_ville(x, window=w)
        marg = np.asarray(W).sum(axis=1)
        np.testing.assert_allclose(marg, 64 * w[16] * np.abs(x) ** 2,
                                   rtol=1e-3)


class TestProperties:
    def test_real_output(self):
        _, W = ftt.wigner_ville(_chirp())
        assert np.asarray(W).dtype == np.float32

    def test_frequency_marginal(self):
        x = _chirp(64)
        _, W = ftt.wigner_ville(x)
        marg = np.asarray(W).sum(axis=1)
        np.testing.assert_allclose(marg, 64 * np.abs(x) ** 2, rtol=1e-4)

    def test_tone_localization(self):
        n, f0 = 128, 0.2
        t = np.arange(n)
        x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
        f, W = ftt.wigner_ville(x, fs=1.0)
        W = np.asarray(W)
        # center rows: peak at the tone frequency
        for trow in (n // 3, n // 2, 2 * n // 3):
            assert abs(f[np.argmax(W[trow])] - f0) < 0.01

    def test_chirp_ridge_tracks_instantaneous_frequency(self):
        n = 128
        x = _chirp(n)
        f, W = ftt.wigner_ville(x)
        W = np.asarray(W)
        t = np.arange(n)
        finst = 0.05 + 0.15 * t / n
        for trow in range(20, n - 20, 16):
            assert abs(f[np.argmax(W[trow])] - finst[trow]) < 0.02

    def test_batched(self):
        x = np.stack([_chirp(32), np.conj(_chirp(32))])
        _, W = ftt.wigner_ville(x)
        assert np.asarray(W).shape == (2, 32, 32)
        _, W0 = ftt.wigner_ville(x[0])
        np.testing.assert_allclose(np.asarray(W[0]), np.asarray(W0),
                                   atol=1e-5)

    def test_window_validation(self):
        with pytest.raises(ValueError):
            ftt.wigner_ville(_chirp(32), window=np.ones((4, 4)))
        with pytest.raises(ValueError):
            ftt.wigner_ville(_chirp(32), window=np.ones(100))
