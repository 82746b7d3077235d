"""fht/ifht (FFTLog fast Hankel transform) vs the scipy.fft oracle."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt

scipy_fft = pytest.importorskip("scipy.fft")


def _rel(a, b):
    return np.linalg.norm(np.asarray(a, np.float64) - b) / (
        np.linalg.norm(b) + 1e-30)


def _signal(n, dln, seed=0):
    rng = np.random.default_rng(seed)
    # smooth positive log-spaced signal (the FFTLog use case)
    r = np.exp((np.arange(n) - (n - 1) / 2) * dln)
    return (r**2 * np.exp(-(r**2) / 2)
            * (1 + 0.1 * rng.standard_normal(n))).astype(np.float64)


@pytest.mark.parametrize("n", [64, 128, 127])
@pytest.mark.parametrize("mu,bias", [(0.0, 0.0), (0.5, 0.0), (2.0, 0.1),
                                     (1.0, -0.2)])
def test_fht_matches_scipy(n, mu, bias):
    dln = 0.08
    offset = float(scipy_fft.fhtoffset(dln, mu, bias=bias))
    a = _signal(n, dln)
    ours = ftt.fht(a.astype(np.float32), dln, mu, offset=offset, bias=bias)
    ref = scipy_fft.fht(a, dln, mu, offset=offset, bias=bias)
    assert _rel(ours, ref) < 2e-4


@pytest.mark.parametrize("n", [64, 127])
@pytest.mark.parametrize("mu,bias", [(0.0, 0.0), (2.0, 0.1)])
def test_ifht_matches_scipy(n, mu, bias):
    dln = 0.08
    offset = float(scipy_fft.fhtoffset(dln, mu, bias=bias))
    A = _signal(n, dln, seed=3)
    ours = ftt.ifht(A.astype(np.float32), dln, mu, offset=offset, bias=bias)
    ref = scipy_fft.ifht(A, dln, mu, offset=offset, bias=bias)
    assert _rel(ours, ref) < 2e-4


def test_fht_roundtrip():
    n, dln, mu = 128, 0.05, 0.5
    offset = float(ftt.fhtoffset(dln, mu))
    a = _signal(n, dln, seed=7).astype(np.float32)
    A = ftt.fht(a, dln, mu, offset=offset)
    back = ftt.ifht(A, dln, mu, offset=offset)
    assert _rel(back, np.asarray(a, np.float64)) < 2e-4


def test_fht_batched_rows():
    n, dln, mu = 64, 0.1, 1.0
    a = np.stack([_signal(n, dln, seed=s) for s in range(4)])
    ours = ftt.fht(a.astype(np.float32), dln, mu)
    ref = scipy_fft.fht(a, dln, mu)
    assert ours.shape == ref.shape
    assert _rel(ours, ref) < 2e-4


def test_fhtoffset_matches_scipy():
    for dln, mu, bias in [(0.1, 0.0, 0.0), (0.05, 2.0, 0.3), (0.2, 0.5, -0.4)]:
        ours = ftt.fhtoffset(dln, mu, initial=0.1, bias=bias)
        ref = scipy_fft.fhtoffset(dln, mu, initial=0.1, bias=bias)
        assert abs(ours - ref) < 1e-12


def test_fht_coeff_lanczos_fallback_matches_scipy_loggamma():
    from scipy.special import loggamma

    from fft_wgpu_tpu.ops.fftlog import _lanczos_loggamma

    zs = [0.75 + 3.2j, 1.5 + 0.0j, 0.25 + 1.0j, 2.5 - 4.0j, 0.1 + 0.1j]
    for z in zs:
        ours = _lanczos_loggamma(complex(z))
        ref = loggamma(z)
        assert abs(ours - ref) < 1e-10


def test_fht_complex_input_rejected():
    with pytest.raises(TypeError):
        ftt.fht(np.ones(16, np.complex64), 0.1, 0.0)
