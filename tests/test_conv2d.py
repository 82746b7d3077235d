"""scipy oracles for ops/conv2d.py: convolve2d / correlate2d boundary
modes, deconvolve, wiener, Savitzky-Golay, morlet."""

import numpy as np
import pytest
import scipy.signal as sps

from fft_wgpu_tpu.ops.conv2d import (
    convolve2d,
    correlate2d,
    deconvolve,
    morlet,
    savgol_coeffs,
    savgol_filter,
    wiener,
)

RNG = np.random.default_rng(1234)


def _rel(a, b):
    b = np.asarray(b)
    return np.linalg.norm(np.asarray(a) - b) / max(np.linalg.norm(b), 1e-30)


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_convolve2d_modes(mode, boundary):
    a = RNG.standard_normal((23, 17)).astype(np.float32)
    k = RNG.standard_normal((5, 3)).astype(np.float32)
    got = np.asarray(convolve2d(a, k, mode=mode, boundary=boundary))
    want = sps.convolve2d(a, k, mode=mode, boundary=boundary)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_correlate2d_modes(mode, boundary):
    a = RNG.standard_normal((19, 21)).astype(np.float32)
    k = RNG.standard_normal((4, 6)).astype(np.float32)
    got = np.asarray(correlate2d(a, k, mode=mode, boundary=boundary))
    want = sps.correlate2d(a, k, mode=mode, boundary=boundary)
    assert got.shape == want.shape
    assert _rel(got, want) < 1e-5


def test_convolve2d_fillvalue():
    a = RNG.standard_normal((12, 9)).astype(np.float32)
    k = RNG.standard_normal((3, 5)).astype(np.float32)
    got = np.asarray(convolve2d(a, k, mode="same", boundary="fill",
                                fillvalue=2.5))
    want = sps.convolve2d(a, k, mode="same", boundary="fill", fillvalue=2.5)
    assert _rel(got, want) < 1e-5


def test_convolve2d_complex():
    a = (RNG.standard_normal((10, 11))
         + 1j * RNG.standard_normal((10, 11))).astype(np.complex64)
    k = (RNG.standard_normal((4, 4))
         + 1j * RNG.standard_normal((4, 4))).astype(np.complex64)
    got = np.asarray(convolve2d(a, k, mode="same", boundary="wrap"))
    want = sps.convolve2d(a, k, mode="same", boundary="wrap")
    assert _rel(got, want) < 1e-5


def test_correlate2d_complex_conjugates_template():
    a = (RNG.standard_normal((9, 9))
         + 1j * RNG.standard_normal((9, 9))).astype(np.complex64)
    k = (RNG.standard_normal((3, 3))
         + 1j * RNG.standard_normal((3, 3))).astype(np.complex64)
    got = np.asarray(correlate2d(a, k, mode="full"))
    want = sps.correlate2d(a, k, mode="full")
    assert _rel(got, want) < 1e-5


def test_convolve2d_valid_requires_containment():
    a = RNG.standard_normal((5, 9))
    k = RNG.standard_normal((7, 3))
    with pytest.raises(ValueError):
        convolve2d(a, k, mode="valid")


def test_deconvolve_roundtrip():
    div = np.array([1.0, 0.5, -0.25])
    quot = RNG.standard_normal(17)
    sig = np.convolve(div, quot)
    q, r = deconvolve(sig, div)
    qs, rs = sps.deconvolve(sig, div)
    assert np.allclose(q, qs, atol=1e-10)
    assert np.allclose(r, rs, atol=1e-10)
    assert np.allclose(q, quot, atol=1e-10)


def test_deconvolve_short_signal():
    q, r = deconvolve([1.0, 2.0], [1.0, 1.0, 1.0])
    assert q.size == 0
    assert np.allclose(r, [1.0, 2.0])


def test_wiener_matches_scipy():
    im = RNG.standard_normal((24, 20)).astype(np.float32)
    got = np.asarray(wiener(im, mysize=5))
    want = sps.wiener(im.astype(np.float64), mysize=5)
    assert _rel(got, want) < 2e-4

    got = np.asarray(wiener(im, mysize=(3, 7), noise=0.5))
    want = sps.wiener(im.astype(np.float64), mysize=(3, 7), noise=0.5)
    assert _rel(got, want) < 2e-4


def test_wiener_1d():
    x = RNG.standard_normal(64).astype(np.float32)
    got = np.asarray(wiener(x, mysize=9))
    want = sps.wiener(x.astype(np.float64), mysize=9)
    assert _rel(got, want) < 2e-4


@pytest.mark.parametrize("wl,po,deriv", [(5, 2, 0), (7, 3, 1), (9, 4, 2),
                                         (11, 2, 0)])
def test_savgol_coeffs(wl, po, deriv):
    got = savgol_coeffs(wl, po, deriv=deriv, delta=0.5)
    want = sps.savgol_coeffs(wl, po, deriv=deriv, delta=0.5)
    assert np.allclose(got, want, atol=1e-10)


def test_savgol_coeffs_pos_dot():
    got = savgol_coeffs(7, 3, pos=2, use="dot")
    want = sps.savgol_coeffs(7, 3, pos=2, use="dot")
    assert np.allclose(got, want, atol=1e-10)


@pytest.mark.parametrize("mode", ["interp", "mirror", "nearest", "constant",
                                  "wrap"])
def test_savgol_filter_modes(mode):
    x = np.cumsum(RNG.standard_normal(80)).astype(np.float32)
    got = np.asarray(savgol_filter(x, 11, 3, mode=mode, cval=1.0))
    want = sps.savgol_filter(x.astype(np.float64), 11, 3, mode=mode,
                             cval=1.0)
    assert _rel(got, want) < 1e-4


def test_savgol_filter_deriv_axis():
    x = RNG.standard_normal((6, 50)).astype(np.float32)
    got = np.asarray(savgol_filter(x, 9, 3, deriv=1, delta=0.1, axis=-1))
    want = sps.savgol_filter(x.astype(np.float64), 9, 3, deriv=1, delta=0.1,
                             axis=-1)
    assert _rel(got, want) < 1e-4


def test_savgol_filter_polynomial_exact():
    # a degree-2 signal is reproduced exactly (including interp edges)
    t = np.linspace(0, 1, 40)
    x = 3.0 * t * t - t + 0.25
    got = np.asarray(savgol_filter(x.astype(np.float32), 7, 2))
    assert _rel(got, x) < 1e-5


def test_savgol_interp_window_too_long():
    with pytest.raises(ValueError):
        savgol_filter(np.zeros(5, np.float32), 7, 2, mode="interp")


def test_morlet():
    # scipy.signal.morlet was removed in scipy 1.17; oracle is the
    # closed form pi^-1/4 (e^{iwx} - e^{-w^2/2}) e^{-x^2/2} on the grid
    # x = linspace(-2*pi*s, 2*pi*s, M) that scipy used.
    M, w, s = 64, 5.0, 1.2
    x = np.linspace(-2 * np.pi * s, 2 * np.pi * s, M)
    want = (np.pi ** -0.25
            * (np.exp(1j * w * x) - np.exp(-0.5 * w * w))
            * np.exp(-0.5 * x * x))
    assert np.allclose(morlet(M, w=w, s=s, complete=True), want, atol=1e-12)

    got = morlet(33, complete=False)
    x = np.linspace(-2 * np.pi, 2 * np.pi, 33)
    want = np.pi ** -0.25 * np.exp(1j * 5.0 * x) * np.exp(-0.5 * x * x)
    assert np.allclose(got, want, atol=1e-12)
    # admissibility: the complete wavelet has (near-)zero mean
    assert abs(morlet(257, w=5.0).mean()) < 1e-6


def test_wiener_even_window_matches_scipy():
    # even mysize: scipy's correlate(im, box, 'same') of the SYMMETRIC
    # box equals convolve's (k-1)//2 crop (measured against the scipy
    # oracle; ADVICE r2's k//2 claim was falsified by this test)
    im = RNG.standard_normal((20, 24)).astype(np.float32)
    got = np.asarray(wiener(im, mysize=(4, 6)))
    want = sps.wiener(im.astype(np.float64), mysize=(4, 6))
    assert _rel(got, want) < 1e-4


def test_wiener_rejects_complex():
    z = (RNG.standard_normal((8, 8)) + 1j * RNG.standard_normal((8, 8)))
    with pytest.raises(ValueError):
        wiener(z.astype(np.complex64))


@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_convolve2d_complex_boundaries(boundary):
    # host numpy complex input + non-trivial boundary: must split on the
    # host (no complex H2D transfer) and still match scipy
    a = (RNG.standard_normal((13, 11))
         + 1j * RNG.standard_normal((13, 11))).astype(np.complex64)
    k = (RNG.standard_normal((4, 3))
         + 1j * RNG.standard_normal((4, 3))).astype(np.complex64)
    got = np.asarray(convolve2d(a, k, mode="same", boundary=boundary))
    want = sps.convolve2d(a, k, mode="same", boundary=boundary)
    assert _rel(got, want) < 1e-4


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_correlate2d_complex_even_kernel(mode):
    a = (RNG.standard_normal((16, 12))
         + 1j * RNG.standard_normal((16, 12))).astype(np.complex64)
    k = (RNG.standard_normal((4, 6))
         + 1j * RNG.standard_normal((4, 6))).astype(np.complex64)
    got = np.asarray(correlate2d(a, k, mode=mode))
    want = sps.correlate2d(a, k, mode=mode)
    assert _rel(got, want) < 1e-4


def test_convolve2d_complex_fillvalue():
    a = RNG.standard_normal((9, 9)).astype(np.float32)
    k = RNG.standard_normal((3, 3)).astype(np.float32)
    fv = 1.5 + 0.5j
    got = np.asarray(convolve2d(a, k, mode="same", fillvalue=fv))
    want = sps.convolve2d(a.astype(np.complex128), k, mode="same",
                          fillvalue=fv)
    assert _rel(got, want) < 1e-4
