"""Spectral estimation (periodogram/welch/csd/coherence/spectrogram)
vs the scipy.signal oracle."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

import fft_wgpu_tpu as ftt


def _sig(n=1024, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 1e3
    x = (np.sin(2 * np.pi * 97.0 * t) + 0.5 * rng.standard_normal(n)).astype(
        np.float32)
    if complex_:
        x = (x + 1j * rng.standard_normal(n).astype(np.float32)).astype(
            np.complex64)
    return x


def _close(a, b, rtol=2e-4, atol=1e-6):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-30)
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol * scale + atol)


class TestPeriodogram:
    def test_default(self):
        x = _sig()
        f, p = ftt.periodogram(x, fs=1e3)
        f0, p0 = scipy_signal.periodogram(x, fs=1e3)
        _close(f, f0)
        _close(p, p0)

    def test_window_and_nfft(self):
        x = _sig(500)
        f, p = ftt.periodogram(x, fs=10.0, window="hann", nfft=1024)
        f0, p0 = scipy_signal.periodogram(x, fs=10.0, window="hann", nfft=1024)
        _close(f, f0)
        _close(p, p0)

    def test_spectrum_scaling_twosided(self):
        x = _sig(256)
        f, p = ftt.periodogram(x, scaling="spectrum", return_onesided=False)
        f0, p0 = scipy_signal.periodogram(x, scaling="spectrum",
                                          return_onesided=False)
        _close(f, f0)
        _close(p, p0)

    def test_detrend_linear(self):
        x = _sig(512) + np.linspace(0, 3, 512, dtype=np.float32)
        f, p = ftt.periodogram(x, detrend="linear")
        f0, p0 = scipy_signal.periodogram(x, detrend="linear")
        _close(p, p0, rtol=1e-3)


class TestWelch:
    def test_default(self):
        x = _sig(2048)
        f, p = ftt.welch(x, fs=1e3)
        f0, p0 = scipy_signal.welch(x, fs=1e3)
        _close(f, f0)
        _close(p, p0)

    def test_nperseg_noverlap(self):
        x = _sig(2000)
        f, p = ftt.welch(x, fs=2.0, nperseg=300, noverlap=100)
        f0, p0 = scipy_signal.welch(x, fs=2.0, nperseg=300, noverlap=100)
        _close(f, f0)
        _close(p, p0)

    def test_median_average(self):
        x = _sig(4096, seed=3)
        f, p = ftt.welch(x, nperseg=256, average="median")
        f0, p0 = scipy_signal.welch(x, nperseg=256, average="median")
        _close(p, p0)

    def test_batched_axis(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal((3, 1024)).astype(np.float32)
        f, p = ftt.welch(x, nperseg=128, axis=-1)
        f0, p0 = scipy_signal.welch(x, nperseg=128, axis=-1)
        _close(p, p0)
        fT, pT = ftt.welch(np.ascontiguousarray(x.T), nperseg=128, axis=0)
        _close(pT, p0.T)

    def test_complex_input_twosided(self):
        x = _sig(1024, complex_=True)
        f, p = ftt.welch(x, nperseg=256)
        f0, p0 = scipy_signal.welch(x, nperseg=256)
        _close(f, f0)
        _close(p, p0)

    def test_nperseg_clamp_warns(self):
        x = _sig(100)
        with pytest.warns(UserWarning, match="nperseg"):
            f, p = ftt.welch(x, nperseg=256)
        with pytest.warns(UserWarning, match="nperseg"):
            f0, p0 = scipy_signal.welch(x, nperseg=256)
        _close(p, p0)

    def test_spectrum_scaling(self):
        x = _sig(1024)
        _, p = ftt.welch(x, nperseg=256, scaling="spectrum")
        _, p0 = scipy_signal.welch(x, nperseg=256, scaling="spectrum")
        _close(p, p0)


class TestCsdCoherence:
    def test_csd(self):
        x = _sig(2048, seed=1)
        y = np.roll(x, 11) + 0.1 * _sig(2048, seed=2)
        f, p = ftt.csd(x, y, fs=1e3, nperseg=256)
        f0, p0 = scipy_signal.csd(x, y, fs=1e3, nperseg=256)
        p = np.asarray(ftt.device_get_complex(p))
        _close(p.real, p0.real)
        _close(p.imag, p0.imag)

    def test_csd_complex_inputs(self):
        x = _sig(1024, seed=1, complex_=True)
        y = _sig(1024, seed=2, complex_=True)
        f, p = ftt.csd(x, y, nperseg=128)
        f0, p0 = scipy_signal.csd(x, y, nperseg=128)
        p = np.asarray(ftt.device_get_complex(p))
        _close(p.real, p0.real, rtol=1e-3)
        _close(p.imag, p0.imag, rtol=1e-3)

    def test_coherence(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(4096).astype(np.float32)
        y = x + 0.5 * rng.standard_normal(4096).astype(np.float32)
        f, c = ftt.coherence(x, y, nperseg=256)
        f0, c0 = scipy_signal.coherence(x, y, nperseg=256)
        _close(c, c0, rtol=1e-3)


class TestSpectrogram:
    def test_default(self):
        x = _sig(4096)
        f, t, s = ftt.spectrogram(x, fs=1e3)
        f0, t0, s0 = scipy_signal.spectrogram(x, fs=1e3)
        _close(f, f0)
        _close(t, t0)
        _close(s, s0)

    def test_magnitude_mode(self):
        x = _sig(2048)
        f, t, s = ftt.spectrogram(x, nperseg=128, mode="magnitude")
        f0, t0, s0 = scipy_signal.spectrogram(x, nperseg=128,
                                              mode="magnitude")
        _close(s, s0)

    def test_complex_mode(self):
        x = _sig(1024)
        f, t, s = ftt.spectrogram(x, nperseg=128, noverlap=64,
                                  mode="complex")
        f0, t0, s0 = scipy_signal.spectrogram(x, nperseg=128, noverlap=64,
                                              mode="complex")
        s = np.asarray(ftt.device_get_complex(s))
        _close(s.real, s0.real)
        _close(s.imag, s0.imag)

    def test_batched(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((2, 2048)).astype(np.float32)
        f, t, s = ftt.spectrogram(x, nperseg=256)
        f0, t0, s0 = scipy_signal.spectrogram(x, nperseg=256)
        _close(s, s0)


class TestWindows:
    @pytest.mark.parametrize("alpha", [0.0, 0.25, 0.5, 1.0])
    def test_tukey(self, alpha):
        w = ftt.tukey_window(64, alpha)
        w0 = scipy_signal.windows.tukey(64, alpha, sym=True)
        _close(w, w0, rtol=1e-5)

    def test_get_window_names(self):
        for name in ["hann", "hamming", "blackman", "boxcar"]:
            w = ftt.get_window(name, 32)
            w0 = scipy_signal.get_window(name, 32)
            _close(w, w0, rtol=1e-5)
        w = ftt.get_window(("tukey", 0.25), 33)
        w0 = scipy_signal.get_window(("tukey", 0.25), 33)
        _close(w, w0, rtol=1e-5)

    def test_get_window_array_passthrough(self):
        arr = np.linspace(0, 1, 16, dtype=np.float32)
        w = ftt.get_window(arr, 16)
        _close(w, arr)
        with pytest.raises(ValueError):
            ftt.get_window(arr, 17)
