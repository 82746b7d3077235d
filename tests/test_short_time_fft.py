"""ShortTimeFFT vs the scipy.signal.ShortTimeFFT oracle."""

import numpy as np
import pytest

scipy_signal = pytest.importorskip("scipy.signal")

from fft_wgpu_tpu import ShortTimeFFT


def _pair(m_num=16, hop=4, fs=8.0, **kw):
    w = scipy_signal.windows.hann(m_num, sym=False)
    return (ShortTimeFFT(w, hop, fs, **kw),
            scipy_signal.ShortTimeFFT(w, hop, fs, **kw))


def _sig(n=100, seed=0, complex_=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    if complex_:
        x = x + 1j * rng.standard_normal(n)
    return x


def _close(a, b, tol=1e-5):
    a, b = np.asarray(a, complex), np.asarray(b, complex)
    assert a.shape == b.shape, (a.shape, b.shape)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)
    assert rel < tol, rel


class TestIndexAlgebra:
    @pytest.mark.parametrize("m,hop", [(16, 4), (15, 4), (16, 5), (9, 2),
                                       (8, 8)])
    def test_boundaries_match_scipy(self, m, hop):
        w = scipy_signal.windows.gaussian(m, m / 6)
        ours = ShortTimeFFT(w, hop, 10.0)
        sp = scipy_signal.ShortTimeFFT(w, hop, 10.0)
        assert ours.p_min == sp.p_min and ours.k_min == sp.k_min
        assert ours.m_num_mid == sp.m_num_mid
        for n in (40, 57):
            assert ours.p_max(n) == sp.p_max(n)
            assert ours.k_max(n) == sp.k_max(n)
            assert ours.p_num(n) == sp.p_num(n)
            assert ours.upper_border_begin(n) == sp.upper_border_begin(n)
            np.testing.assert_allclose(ours.t(n), sp.t(n))
        assert ours.lower_border_end == sp.lower_border_end
        np.testing.assert_allclose(ours.f, sp.f)
        assert ours.f_pts == sp.f_pts
        assert ours.delta_t == sp.delta_t and ours.delta_f == sp.delta_f

    def test_dual_window_and_invertible(self):
        ours, sp = _pair()
        np.testing.assert_allclose(ours.dual_win, sp.dual_win, atol=1e-12)
        assert ours.invertible == sp.invertible
        bad = ShortTimeFFT(np.ones(8), 9, 1.0)
        assert not bad.invertible


class TestSTFT:
    @pytest.mark.parametrize("mode,kw", [
        ("onesided", {}), ("onesided2X", {"scale_to": "magnitude"}),
        ("twosided", {}), ("centered", {})])
    def test_fft_modes(self, mode, kw):
        ours, sp = _pair(fft_mode=mode, **kw)
        x = _sig(100)
        _close(ours.stft(x), sp.stft(x))

    def test_onesided2X_requires_scaling(self):
        with pytest.raises(ValueError):
            _pair(fft_mode="onesided2X")

    @pytest.mark.parametrize("mode", ["twosided", "centered"])
    def test_complex_input(self, mode):
        ours, sp = _pair(fft_mode=mode)
        x = _sig(80, complex_=True)
        _close(ours.stft(x), sp.stft(x))

    def test_complex_input_rejected_onesided(self):
        ours, _ = _pair()
        with pytest.raises(ValueError):
            ours.stft(_sig(50, complex_=True))

    @pytest.mark.parametrize("padding", ["zeros", "edge", "even", "odd"])
    def test_padding_modes(self, padding):
        ours, sp = _pair(m_num=12, hop=3)
        x = _sig(50, seed=3)
        _close(ours.stft(x, padding=padding), sp.stft(x, padding=padding))

    def test_mfft_oversample_and_odd(self):
        for mfft in (24, 25):
            ours, sp = _pair(mfft=mfft)
            x = _sig(64, seed=1)
            _close(ours.stft(x), sp.stft(x))

    def test_phase_shift_none(self):
        ours, sp = _pair(phase_shift=None)
        x = _sig(60)
        _close(ours.stft(x), sp.stft(x))

    @pytest.mark.parametrize("scale", ["magnitude", "psd"])
    def test_scalings(self, scale):
        ours, sp = _pair(scale_to=scale)
        assert ours.scaling == sp.scaling
        np.testing.assert_allclose(ours.win, sp.win, atol=1e-12)
        assert np.isclose(ours.fac_magnitude, sp.fac_magnitude)
        assert np.isclose(ours.fac_psd, sp.fac_psd)
        x = _sig(70, seed=2)
        _close(ours.stft(x), sp.stft(x))

    def test_onesided2X_psd(self):
        ours, sp = _pair(fft_mode="onesided2X", scale_to="psd")
        x = _sig(90, seed=4)
        _close(ours.stft(x), sp.stft(x))

    def test_slice_range_and_k_offset(self):
        ours, sp = _pair()
        x = _sig(100)
        _close(ours.stft(x, p0=2, p1=10, k_offset=3),
               sp.stft(x, p0=2, p1=10, k_offset=3))

    def test_batched_and_axis(self):
        ours, sp = _pair()
        x = np.stack([_sig(64, seed=i) for i in range(3)])
        got = np.asarray(ours.stft(x))
        want = sp.stft(x)
        _close(got, want)
        got0 = np.asarray(ours.stft(x.T, axis=0))
        want0 = sp.stft(x.T, axis=0)
        _close(got0, want0)

    def test_spectrogram(self):
        ours, sp = _pair()
        x, y = _sig(64), _sig(64, seed=9)
        _close(ours.spectrogram(x), sp.spectrogram(x))
        _close(ours.spectrogram(x, y), sp.spectrogram(x, y))


class TestISTFT:
    @pytest.mark.parametrize("mode,kw", [
        ("onesided", {}), ("onesided2X", {"scale_to": "psd"}),
        ("twosided", {}), ("centered", {})])
    def test_roundtrip(self, mode, kw):
        ours, sp = _pair(fft_mode=mode, **kw)
        x = _sig(100, seed=5)
        S = ours.stft(x)
        xr = np.asarray(ours.istft(S, k1=len(x)))
        assert np.abs(xr - x).max() < 1e-5

    def test_matches_scipy_istft(self):
        ours, sp = _pair()
        x = _sig(100, seed=6)
        S = sp.stft(x)
        got = np.asarray(ours.istft(S.astype(np.complex64), k1=len(x)))
        want = sp.istft(S, k1=len(x))
        _close(got, want, tol=1e-5)

    def test_k0_k1_window(self):
        ours, sp = _pair()
        x = _sig(100, seed=7)
        S = sp.stft(x)
        got = np.asarray(ours.istft(S.astype(np.complex64), k0=12, k1=80))
        want = sp.istft(S, k0=12, k1=80)
        _close(got, want, tol=1e-5)

    def test_complex_roundtrip(self):
        ours, _ = _pair(fft_mode="twosided")
        x = _sig(96, seed=8, complex_=True)
        S = ours.stft(x)
        xr = np.asarray(ours.istft(S, k1=len(x)))
        assert np.abs(xr - x).max() < 1e-5

    def test_scaled_roundtrip(self):
        ours, _ = _pair(scale_to="psd")
        x = _sig(77, seed=10)
        xr = np.asarray(ours.istft(ours.stft(x), k1=len(x)))
        assert np.abs(xr - x).max() < 1e-5

    def test_validation(self):
        ours, _ = _pair()
        x = _sig(64)
        S = np.asarray(ours.stft(x))
        with pytest.raises(ValueError):
            ours.istft(S[:-1], k1=64)  # wrong f_pts
        with pytest.raises(ValueError):
            ours.istft(S, k0=-1000, k1=64)


class TestReviewRegressions:
    def test_odd_window_istft(self):
        # odd m_num with default (odd) mfft must roundtrip
        w = scipy_signal.windows.hann(7, sym=False)
        ours = ShortTimeFFT(w, 2, 1.0)
        sp = scipy_signal.ShortTimeFFT(w, 2, 1.0)
        x = _sig(40, seed=11)
        S = ours.stft(x)
        _close(S, sp.stft(x))
        xr = np.asarray(ours.istft(S, k1=len(x)))
        assert np.abs(xr - x).max() < 1e-5

    def test_complex_window_rejected(self):
        with pytest.raises(ValueError):
            ShortTimeFFT(np.hanning(8).astype(complex) * 1j, 2, 1.0)

    def test_fft_mode_mutation_refreshes_cache(self):
        ours, sp = _pair()
        x = _sig(64, seed=12)
        _ = ours.stft(x)
        ours.fft_mode = "twosided"
        sp.fft_mode = "twosided"
        _close(ours.stft(x), sp.stft(x))

    def test_list_input_is_real(self):
        ours, sp = _pair()
        x = list(np.arange(32.0))
        _close(ours.stft(x), sp.stft(np.asarray(x)))
