"""Waveform generators vs scipy.signal oracles (ops/waveforms.py)."""

import inspect

import numpy as np
import pytest
import scipy.signal as sps

import fft_wgpu_tpu as ftt


def _t():
    return np.linspace(0, 10, 501)


@pytest.mark.parametrize("method", ["linear", "quadratic", "logarithmic",
                                    "hyperbolic"])
@pytest.mark.parametrize("vertex_zero", [True, False])
def test_chirp_methods(method, vertex_zero):
    t = _t()
    got = ftt.chirp(t, f0=1.5, t1=10, f1=6.0, method=method, phi=33,
                    vertex_zero=vertex_zero)
    want = sps.chirp(t, f0=1.5, t1=10, f1=6.0, method=method, phi=33,
                     vertex_zero=vertex_zero)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_chirp_negative_sweep_and_equal_freqs():
    t = _t()
    for f0, f1, method in [(6.0, 1.5, "hyperbolic"), (4.0, 4.0, "log"),
                           (-2.0, -5.0, "logarithmic"),
                           (3.0, 3.0, "hyperbolic")]:
        np.testing.assert_allclose(
            ftt.chirp(t, f0, 10, f1, method),
            sps.chirp(t, f0, 10, f1, method), atol=1e-12)


def test_chirp_complex():
    t = _t()
    got = ftt.chirp(t, 1.0, 10, 5.0, complex=True)
    if "complex" in inspect.signature(sps.chirp).parameters:
        want = sps.chirp(t, 1.0, 10, 5.0, complex=True)
        np.testing.assert_allclose(got, want, atol=1e-12)
    # analytic-signal invariants hold regardless of the scipy version
    np.testing.assert_allclose(np.abs(got), 1.0, atol=1e-12)
    np.testing.assert_allclose(got.real, sps.chirp(t, 1.0, 10, 5.0),
                               atol=1e-12)


def test_chirp_validation():
    with pytest.raises(ValueError):
        ftt.chirp(_t(), 1.0, 10, -2.0, method="logarithmic")
    with pytest.raises(ValueError):
        ftt.chirp(_t(), 0.0, 10, 2.0, method="hyperbolic")
    with pytest.raises(ValueError):
        ftt.chirp(_t(), 1.0, 10, 2.0, method="bogus")


def test_sweep_poly():
    t = _t()
    for poly in ([0.05, -0.75, 2.0], np.poly1d([0.1, 1.0]),
                 [1.0], [0.025, -0.36, 1.25, 2.0]):
        np.testing.assert_allclose(ftt.sweep_poly(t, poly, phi=12),
                                   sps.sweep_poly(t, poly, phi=12),
                                   atol=1e-12)


def test_gausspulse():
    t = np.linspace(-1, 1, 1001) * 1e-2
    got = ftt.gausspulse(t, fc=1000, bw=0.5)
    np.testing.assert_allclose(got, sps.gausspulse(t, fc=1000, bw=0.5),
                               atol=1e-12)
    gi, gq, ge = ftt.gausspulse(t, fc=700, bw=0.3, bwr=-9, retquad=True,
                                retenv=True)
    wi, wq, we = sps.gausspulse(t, fc=700, bw=0.3, bwr=-9, retquad=True,
                                retenv=True)
    np.testing.assert_allclose(gi, wi, atol=1e-12)
    np.testing.assert_allclose(gq, wq, atol=1e-12)
    np.testing.assert_allclose(ge, we, atol=1e-12)
    assert np.isclose(ftt.gausspulse("cutoff", fc=1000, bw=0.5, tpr=-60),
                      sps.gausspulse("cutoff", fc=1000, bw=0.5, tpr=-60))
    for bad in (dict(fc=-1), dict(bw=0), dict(bwr=1)):
        with pytest.raises(ValueError):
            ftt.gausspulse(t, **bad)
    with pytest.raises(ValueError):
        ftt.gausspulse("nope")


@pytest.mark.parametrize("width", [1.0, 0.0, 0.5, 0.25])
def test_sawtooth(width):
    t = np.linspace(-15, 15, 2001)
    np.testing.assert_allclose(ftt.sawtooth(t, width),
                               sps.sawtooth(t, width), atol=1e-12)


def test_sawtooth_array_width_and_bad():
    t = np.linspace(0, 4 * np.pi, 301)
    w = np.full_like(t, 0.3)
    np.testing.assert_allclose(ftt.sawtooth(t, w), sps.sawtooth(t, w),
                               atol=1e-12)
    assert np.all(np.isnan(ftt.sawtooth(t, 1.5)))


@pytest.mark.parametrize("duty", [0.5, 0.1, 0.9, 0.0, 1.0])
def test_square(duty):
    t = np.linspace(-15, 15, 2001)
    np.testing.assert_allclose(ftt.square(t, duty), sps.square(t, duty),
                               atol=0)
    assert np.all(np.isnan(ftt.square(t, -0.1)))


def test_unit_impulse():
    np.testing.assert_array_equal(ftt.unit_impulse(7),
                                  sps.unit_impulse(7))
    np.testing.assert_array_equal(ftt.unit_impulse(7, 2),
                                  sps.unit_impulse(7, 2))
    np.testing.assert_array_equal(ftt.unit_impulse((5, 6), "mid"),
                                  sps.unit_impulse((5, 6), "mid"))
    np.testing.assert_array_equal(ftt.unit_impulse((4, 4), (1, 2)),
                                  sps.unit_impulse((4, 4), (1, 2)))
    assert ftt.unit_impulse(5, dtype=np.complex64).dtype == np.complex64


@pytest.mark.parametrize("nbits", [2, 3, 5, 8, 11])
def test_max_len_seq_vs_scipy(nbits):
    got, gst = ftt.max_len_seq(nbits)
    want, wst = sps.max_len_seq(nbits)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(gst, wst)
    # partial length + explicit state resumes identically
    st = (np.arange(nbits) % 3 == 0).astype(np.int8) if nbits >= 3 else None
    got, _ = ftt.max_len_seq(nbits, state=st, length=17)
    want, _ = sps.max_len_seq(nbits, state=st, length=17)
    np.testing.assert_array_equal(got, want)


def test_max_len_seq_mls_property():
    # the defining property: +-1 MLS circular autocorrelation is
    # N at lag 0 and -1 everywhere else — checked through OUR fft path
    seq, _ = ftt.max_len_seq(7)
    s = 2.0 * seq - 1.0
    n = s.size
    spec = np.fft.fft(s)
    acorr = np.fft.ifft(spec * np.conj(spec)).real
    assert abs(acorr[0] - n) < 1e-9
    np.testing.assert_allclose(acorr[1:], -1.0, atol=1e-9)
    with pytest.raises(ValueError):
        ftt.max_len_seq(33)
    with pytest.raises(ValueError):
        ftt.max_len_seq(4, state=np.zeros(4))


def test_vectorstrength():
    ev = np.array([0.1, 0.2, 1.1, 2.1, 3.05])
    for period in (1.0, np.array([0.5, 1.0, 2.0])):
        gs, gp = ftt.vectorstrength(ev, period)
        ws, wp = sps.vectorstrength(ev, period)
        np.testing.assert_allclose(gs, ws, atol=1e-12)
        np.testing.assert_allclose(gp, wp, atol=1e-12)
    # perfectly phase-locked events -> strength 1
    gs, _ = ftt.vectorstrength(np.arange(10, dtype=float), 1.0)
    assert np.isclose(gs, 1.0)
    # scalar (0-d) events are valid in scipy — must not crash
    gs, gp = ftt.vectorstrength(3.0, 1.0)
    ws, wp = sps.vectorstrength(3.0, 1.0)
    assert np.isclose(gs, ws) and np.isclose(gp, wp)
    with pytest.raises(ValueError):
        ftt.vectorstrength(ev, -1.0)
    with pytest.raises(ValueError):
        ftt.vectorstrength(np.ones((2, 2)), 1.0)
