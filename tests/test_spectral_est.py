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


class TestWindows:
    @pytest.mark.parametrize("n", [64, 65])
    def test_kaiser(self, n):
        w = ftt.kaiser_window(n, 8.6)
        w0 = scipy_signal.windows.kaiser(n, 8.6, sym=True)
        _close(w, w0, rtol=1e-5)
        wp = ftt.kaiser_window(n, 5.0, periodic=True)
        wp0 = scipy_signal.get_window(("kaiser", 5.0), n, fftbins=True)
        _close(wp, wp0, rtol=1e-5)

    @pytest.mark.parametrize("n", [64, 65])
    def test_flattop(self, n):
        _close(ftt.flattop_window(n),
               scipy_signal.windows.flattop(n, sym=True), rtol=1e-4)
        _close(ftt.get_window("flattop", n),
               scipy_signal.get_window("flattop", n, fftbins=True),
               rtol=1e-4)

    def test_get_window_kaiser_tuple(self):
        _close(ftt.get_window(("kaiser", 7.0), 128),
               scipy_signal.get_window(("kaiser", 7.0), 128), rtol=1e-5)


class TestDPSS:
    @pytest.mark.parametrize("M,NW,K", [(128, 3.0, 5), (257, 4.0, 7),
                                        (64, 2.5, 4)])
    def test_windows_match_scipy(self, M, NW, K):
        w = np.asarray(ftt.dpss(M, NW, K))
        w0 = scipy_signal.windows.dpss(M, NW, K)
        assert w.shape == (K, M)
        _close(w, w0, rtol=5e-4, atol=1e-5)

    def test_ratios_match_scipy(self):
        w, lam = ftt.dpss(200, 4.0, 6, return_ratios=True)
        w0, lam0 = scipy_signal.windows.dpss(200, 4.0, 6,
                                             return_ratios=True)
        _close(np.asarray(w), w0, rtol=5e-4, atol=1e-5)
        np.testing.assert_allclose(lam, lam0, rtol=1e-6, atol=1e-9)
        assert np.all(np.diff(lam) < 0) and lam[0] > 0.999

    def test_single_window_squeeze(self):
        w = ftt.dpss(100, 2.0)
        assert np.asarray(w).shape == (100,)

    @pytest.mark.parametrize("M", [63, 64])
    def test_single_window_default_norm(self, M):
        # Kmax=None defaults to norm='approximate' (unit peak + even-M
        # correction), matching scipy exactly
        _close(np.asarray(ftt.dpss(M, 2.5)),
               scipy_signal.windows.dpss(M, 2.5), rtol=5e-4, atol=1e-5)

    @pytest.mark.parametrize("norm", ["approximate", "subsample"])
    def test_norm_modes(self, norm):
        _close(np.asarray(ftt.dpss(64, 2.5, 3, norm=norm)),
               scipy_signal.windows.dpss(64, 2.5, 3, norm=norm),
               rtol=5e-4, atol=1e-5)

    def test_periodic(self):
        _close(np.asarray(ftt.dpss(64, 2.5, 3, sym=False)),
               scipy_signal.windows.dpss(64, 2.5, 3, sym=False),
               rtol=5e-4, atol=1e-5)

    def test_validation(self):
        with pytest.raises(ValueError):
            ftt.dpss(64, 40.0, 3)  # NW >= M/2
        with pytest.raises(ValueError):
            ftt.dpss(64, 2.0, 0)
        with pytest.raises(ValueError):
            ftt.dpss(64, 2.0, 3, norm="bogus")


class TestMultitaper:
    def _oracle(self, x, fs, NW, K, nfft=None, weights="unity"):
        """Direct numpy eigenspectrum combination."""
        n = len(x)
        nfft = nfft or n
        tapers, lam = scipy_signal.windows.dpss(n, NW, K,
                                                return_ratios=True)
        X = np.fft.rfft(tapers * (x - x.mean()), nfft, axis=-1)
        Sk = np.abs(X) ** 2 / fs
        if weights == "unity":
            S = Sk.mean(axis=0)
        else:
            S = (Sk * lam[:, None]).sum(axis=0) / lam.sum()
        mult = np.full(nfft // 2 + 1, 2.0)
        mult[0] = 1.0
        if nfft % 2 == 0:
            mult[-1] = 1.0
        return S * mult

    @pytest.mark.parametrize("weights", ["unity", "eigen"])
    def test_vs_direct_oracle(self, weights):
        x = _sig(512)
        f, S = ftt.multitaper(x, fs=1e3, NW=4.0, K=7, weights=weights)
        S0 = self._oracle(np.asarray(x, np.float64), 1e3, 4.0, 7,
                          weights=weights)
        _close(S, S0, rtol=2e-3, atol=1e-5)
        f0 = np.fft.rfftfreq(512, 1 / 1e3)
        _close(f, f0)

    def test_nfft_padding(self):
        x = _sig(300)
        f, S = ftt.multitaper(x, fs=2.0, NW=3.5, K=6, nfft=512,
                              weights="unity")
        S0 = self._oracle(np.asarray(x, np.float64), 2.0, 3.5, 6, nfft=512)
        assert S.shape == (257,)
        _close(S, S0, rtol=2e-3, atol=1e-5)

    def test_adaptive_white_noise(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal(2048).astype(np.float32)
        f, S = ftt.multitaper(x, fs=1.0, NW=4.0, weights="adaptive",
                              detrend=False)
        S = np.asarray(S, np.float64)
        assert np.all(S > 0)
        # white noise, unit variance: integrated PSD ~ variance
        df = f[1] - f[0]
        total = np.sum(S * df)
        assert 0.8 < total < 1.2
        # adaptive estimate should be close to the unity-weight one here
        _, Su = ftt.multitaper(x, fs=1.0, NW=4.0, weights="unity",
                               detrend=False)
        rel = np.linalg.norm(S - np.asarray(Su)) / np.linalg.norm(Su)
        assert rel < 0.2

    def test_complex_two_sided(self):
        x = _sig(256, complex_=True)
        f, S = ftt.multitaper(x, fs=8.0, NW=3.0, K=5, weights="eigen")
        assert S.shape == (256,)
        assert f.shape == (256,)
        tapers, lam = scipy_signal.windows.dpss(256, 3.0, 5,
                                                return_ratios=True)
        xd = np.asarray(x, np.complex128)
        xd = xd - xd.mean()
        X = np.fft.fft(tapers * xd, axis=-1)
        Sk = np.abs(X) ** 2 / 8.0
        S0 = (Sk * lam[:, None]).sum(axis=0) / lam.sum()
        _close(S, S0, rtol=2e-3, atol=1e-5)

    def test_sinusoid_peak(self):
        fs, n = 1e3, 1024
        t = np.arange(n) / fs
        x = np.sin(2 * np.pi * 125.0 * t).astype(np.float32)
        f, S = ftt.multitaper(x, fs=fs, NW=4.0, weights="adaptive")
        assert abs(f[np.argmax(np.asarray(S))] - 125.0) < 2.0

    def test_batched(self):
        x = np.stack([_sig(256, seed=i) for i in range(3)])
        f, S = ftt.multitaper(x, fs=1e3, NW=3.0, K=5, weights="unity")
        assert S.shape == (3, 129)
        for i in range(3):
            _, Si = ftt.multitaper(x[i], fs=1e3, NW=3.0, K=5,
                                   weights="unity")
            _close(S[i], Si, rtol=1e-5)


class TestMultitaperTwoSided:
    def test_real_input_two_sided(self):
        x = _sig(256)
        f, S = ftt.multitaper(x, fs=1e3, NW=3.0, K=5,
                              return_onesided=False, weights="unity")
        assert f.shape == (256,) and np.asarray(S).shape == (256,)
        tapers = scipy_signal.windows.dpss(256, 3.0, 5)
        xd = np.asarray(x, np.float64)
        xd = xd - xd.mean()
        Sk = np.abs(np.fft.fft(tapers * xd, axis=-1)) ** 2 / 1e3
        _close(S, Sk.mean(axis=0), rtol=2e-3, atol=1e-5)


class TestLombScargle:
    def _data(self, n=80, seed=0):
        rng = np.random.default_rng(seed)
        t = np.sort(rng.uniform(0, 10, n)).astype(np.float64)
        y = (np.sin(3.0 * t) + 0.5 * np.cos(7.3 * t)
             + 0.2 * rng.standard_normal(n))
        f = np.linspace(0.5, 10.0, 64)
        return t, y, f

    def test_default_power(self):
        t, y, f = self._data()
        got = np.asarray(ftt.lombscargle(t, y, f), np.float64)
        want = scipy_signal.lombscargle(t, y, f)
        _close(got, want, rtol=2e-3, atol=1e-4)

    def test_normalize_true(self):
        t, y, f = self._data(seed=1)
        got = np.asarray(ftt.lombscargle(t, y, f, normalize=True),
                         np.float64)
        want = scipy_signal.lombscargle(t, y, f, normalize=True)
        _close(got, want, rtol=2e-3, atol=1e-5)
        assert got.max() <= 1.0 + 1e-6

    def test_precenter(self):
        t, y, f = self._data(seed=4)
        with pytest.warns(DeprecationWarning):
            got = np.asarray(ftt.lombscargle(t, y + 3.0, f, precenter=True),
                             np.float64)
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            want = scipy_signal.lombscargle(t, y + 3.0, f, precenter=True)
        _close(got, want, rtol=2e-3, atol=1e-4)

    def test_weights_and_floating_mean(self):
        t, y, f = self._data(seed=2)
        rng = np.random.default_rng(3)
        w = rng.uniform(0.5, 2.0, len(t))
        got = np.asarray(ftt.lombscargle(
            t, y + 5.0, f, weights=w, floating_mean=True), np.float64)
        want = scipy_signal.lombscargle(t, y + 5.0, f, weights=w,
                                        floating_mean=True)
        _close(got, want, rtol=5e-3, atol=1e-4)

    def test_amplitude_mode(self):
        t, y, f = self._data(seed=4)
        got = np.asarray(ftt.lombscargle(t, y, f, normalize="amplitude"))
        want = scipy_signal.lombscargle(t, y, f, normalize="amplitude")
        _close(got, want, rtol=5e-3, atol=1e-4)

    def test_peak_at_true_frequency(self):
        t, y, f = self._data(seed=5)
        p = np.asarray(ftt.lombscargle(t, y, f))
        # strongest component at omega = 3.0
        assert abs(f[np.argmax(p)] - 3.0) < 0.25

    def test_validation(self):
        with pytest.raises(ValueError):
            ftt.lombscargle([1.0, 2.0], [1.0], [1.0])
        with pytest.raises(ValueError):
            ftt.lombscargle([1.0], [1.0], [1.0], weights=[-1.0])
        with pytest.raises(ValueError):
            ftt.lombscargle([1.0], [1.0], [1.0], normalize="bogus")


def test_spectrogram_angle_phase_modes(rng):
    """mode='angle'/'phase' (scipy parity, round-3 fuzz).  Angles are
    compared modulo 2*pi: float32 rounding legitimately flips bins whose
    true angle sits on the +-pi branch cut."""
    import scipy.signal as ss

    import fft_wgpu_tpu as ftt

    r = rng.standard_normal(4096).astype(np.float32)
    for mode in ("angle", "phase"):
        _, _, got = ftt.spectrogram(r, nperseg=256, mode=mode)
        _, _, want = ss.spectrogram(r.astype(np.float64), nperseg=256,
                                    mode=mode)
        _, _, C = ss.spectrogram(r.astype(np.float64), nperseg=256,
                                 mode="complex")
        mask = np.abs(C) > np.median(np.abs(C))  # skip near-zero bins
        d = np.abs(np.asarray(got) - want)[mask] % (2 * np.pi)
        d = np.minimum(d, 2 * np.pi - d)
        assert d.max() < 1e-4, mode
