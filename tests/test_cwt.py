"""CWT vs the direct per-scale convolution (scipy.signal.cwt semantics)."""

import numpy as np
import pytest

from fft_wgpu_tpu.ops.cwt import cwt, morlet2, ricker


def _cwt_direct(x, widths, gen):
    """The scipy.signal.cwt reference loop (f64)."""
    out = []
    for w in widths:
        n = min(max(int(10 * w), 1), len(x))
        wl = np.conj(gen(n, w)[::-1])
        out.append(np.convolve(x, wl, mode="same"))
    return np.stack(out)


def test_ricker_matches_direct(rng, assert_close):
    x = rng.standard_normal(300).astype(np.float32)
    widths = [1, 3, 7.5, 12, 31]
    got = np.asarray(cwt(x, widths, "ricker"))
    want = _cwt_direct(x.astype(np.float64), widths, ricker)
    assert got.shape == (5, 300)
    assert_close(got, want, 1e-5)


def test_morlet2_matches_direct(rng, assert_close):
    x = rng.standard_normal(257).astype(np.float32)  # odd length
    widths = [2, 5, 9, 16]
    got = np.asarray(cwt(x, widths, "morlet2"))
    want = _cwt_direct(x.astype(np.float64), widths, morlet2)
    assert np.iscomplexobj(got)
    assert_close(got, want, 1e-5)


def test_morlet2_w_parameter(rng, assert_close):
    from functools import partial

    x = rng.standard_normal(128).astype(np.float32)
    got = np.asarray(cwt(x, [4, 8], "morlet2", w=6.5))
    want = _cwt_direct(x.astype(np.float64), [4, 8],
                       partial(morlet2, w=6.5))
    assert_close(got, want, 1e-5)


def test_scalogram_ridge_tracks_frequency():
    """A pure tone's Morlet scalogram peaks at s = w*fs/(2*pi*f)."""
    fs, f, n = 200.0, 10.0, 600
    t = np.arange(n) / fs
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    widths = np.arange(2.0, 40.0)
    mag = np.abs(np.asarray(cwt(x, widths, "morlet2")))
    ridge = widths[np.argmax(mag[:, n // 2])]
    expect = 5.0 * fs / (2 * np.pi * f)   # ~15.9
    assert abs(ridge - expect) <= 1.0


def test_custom_callable_wavelet(rng, assert_close):
    def boxcar(points, width):
        return np.ones(int(points), np.float64) / max(int(points), 1)

    x = rng.standard_normal(100).astype(np.float32)
    got = np.asarray(cwt(x, [3, 6], boxcar))
    want = _cwt_direct(x.astype(np.float64), [3, 6], boxcar)
    assert_close(got, want, 1e-5)


def test_validation():
    with pytest.raises(ValueError):
        cwt(np.zeros((2, 2), np.float32), [1.0])
    with pytest.raises(ValueError):
        cwt(np.zeros(16, np.float32), [])
    with pytest.raises(ValueError):
        cwt(np.zeros(16, np.float32), [1.0], "nosuch")
