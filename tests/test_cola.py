"""check_COLA / check_NOLA vs scipy.signal, and their contract with istft."""

import numpy as np
import pytest
import scipy.signal as ss

import fft_wgpu_tpu as ft

CASES = [
    ("hann", 256, 128),       # COLA (50% hann)
    ("hann", 256, 192),       # COLA (75% hann)
    ("hann", 256, 64),        # hann at 25% overlap: NOLA but not COLA
    ("boxcar", 256, 0),       # trivially COLA
    ("boxcar", 256, 100),     # not COLA (uneven overlap-add)
    ("blackmanharris", 256, 192),
    ("bartlett", 256, 128),
    (("tukey", 0.25), 256, 32),
    (("gaussian", 40.0), 256, 128),
]


@pytest.mark.parametrize("window,nperseg,noverlap", CASES)
def test_cola_nola_scipy_parity(window, nperseg, noverlap):
    assert ft.check_COLA(window, nperseg, noverlap) == \
        bool(ss.check_COLA(window, nperseg, noverlap))
    assert ft.check_NOLA(window, nperseg, noverlap) == \
        bool(ss.check_NOLA(window, nperseg, noverlap))


def test_nola_zero_hop_window():
    # zero half-window at 50% overlap is still NOLA (the other hop covers
    # it) — but with no overlap the zero samples are never covered.
    w = np.ones(8)
    w[:4] = 0
    assert ft.check_NOLA(w, 8, 4) == bool(ss.check_NOLA(w, 8, 4)) == True
    assert ft.check_NOLA(w, 8, 0) == bool(ss.check_NOLA(w, 8, 0)) == False


def test_validation():
    with pytest.raises(ValueError):
        ft.check_COLA("hann", 256, 256)
    with pytest.raises(ValueError):
        ft.check_NOLA("hann", 256, -1)


def test_nola_implies_istft_reconstruction():
    # the documented contract: NOLA <=> least-squares istft inverts stft
    rng = np.random.default_rng(0)
    x = rng.standard_normal(2048).astype(np.float32)
    win = np.asarray(ft.get_window("hann", 512))
    assert ft.check_NOLA(win, 512, 384)
    Z = ft.stft(x, n_fft=512, hop_length=128, window=win)
    xr = np.asarray(ft.istft(Z, n_fft=512, hop_length=128, window=win,
                             length=2048))
    np.testing.assert_allclose(xr, x, atol=1e-5)
