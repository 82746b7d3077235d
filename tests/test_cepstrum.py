"""Cepstrum ops vs direct-numpy and scipy oracles."""

import numpy as np
import pytest

from fft_wgpu_tpu.ops.cepstrum import (
    complex_cepstrum,
    inverse_complex_cepstrum,
    minimum_phase,
    real_cepstrum,
)


def _rceps_np(x):
    return np.fft.ifft(np.log(np.abs(np.fft.fft(x, axis=-1))), axis=-1).real


def test_real_cepstrum_matches_numpy(rng, assert_close):
    x = rng.standard_normal((5, 256)).astype(np.float32) + 3.0
    got = np.asarray(real_cepstrum(x))
    assert_close(got, _rceps_np(x.astype(np.float64)), 1e-5)


def test_real_cepstrum_axis_and_n(rng, assert_close):
    x = rng.standard_normal((128, 4)).astype(np.float32) + 2.0
    got = np.asarray(real_cepstrum(x, n=64, axis=0))
    assert_close(got, _rceps_np(x[:64].astype(np.float64).T).T, 1e-5)


def test_complex_cepstrum_roundtrip(assert_close):
    """icceps(cceps(x)) == x for smooth-phase signals (the MATLAB pair's
    contract: exact when the unwrapped corrected phase is truly odd —
    e.g. a pulse-dominated or minimum-phase signal)."""
    n = 128
    t = np.arange(n, dtype=np.float32)
    rows = np.stack([
        np.sin(2 * np.pi * t / n * 5) * np.exp(-t / 40.0)
        + 8.0 * np.exp(-((t - 3.0) ** 2) / 4.0),
        (0.9 ** t),
    ])
    c, nd = complex_cepstrum(rows)
    back = np.asarray(inverse_complex_cepstrum(c, nd))
    assert_close(back, rows, 2e-5)


def test_complex_cepstrum_echo_spike():
    """A signal with an echo at lag d shows the cepstral peak at d."""
    n, d, a = 512, 40, 0.5
    rng = np.random.default_rng(11)
    base = rng.standard_normal(n // 4).astype(np.float32)
    x = np.zeros(n, np.float32)
    x[: n // 4] = base
    x[d : d + n // 4] += a * base
    c = np.asarray(real_cepstrum(x))
    # theory: the echo factor (1 + a z^-d) contributes a^k/k spikes at
    # k*d in the COMPLEX cepstrum; the real cepstrum is its even part,
    # so the k=1 spike height is a/2
    interior = c[8 : n // 2]  # skip the low-quefrency envelope
    assert np.argmax(interior) + 8 == d
    assert abs(c[d] - a / 2) < 0.05


def test_minimum_phase_matches_scipy(assert_close):
    ss = pytest.importorskip("scipy.signal")
    h = ss.firwin(31, 0.2)
    got = np.asarray(minimum_phase(h))
    want = ss.minimum_phase(h, method="homomorphic")
    assert got.shape == want.shape
    # f32 pipeline vs scipy's f64 through a 16384-point n_fft
    assert_close(got, want, 5e-4, "(vs scipy homomorphic)")


def test_minimum_phase_hilbert_and_half(assert_close):
    ss = pytest.importorskip("scipy.signal")
    h = ss.firwin(65, 0.3)
    got = np.asarray(minimum_phase(h, method="hilbert"))
    want = ss.minimum_phase(h, method="hilbert")
    assert got.shape == want.shape
    assert_close(got, want, 5e-3, "(vs scipy hilbert)")
    got = np.asarray(minimum_phase(h, half=False))
    want = ss.minimum_phase(h, half=False)
    assert got.shape == want.shape
    assert_close(got, want, 5e-4, "(half=False)")
    with pytest.raises(ValueError):
        minimum_phase(h, method="hilbert", half=False)
    with pytest.raises(ValueError):
        minimum_phase(h, method="bogus")


def test_minimum_phase_is_minimum_phase():
    """All zeros of the result lie inside the unit circle."""
    ss = pytest.importorskip("scipy.signal")
    h = ss.firwin(21, 0.4)
    hm = np.asarray(minimum_phase(h), np.float64)
    roots = np.roots(hm)
    assert np.all(np.abs(roots) < 1.0 + 1e-6)


def test_minimum_phase_validation():
    with pytest.raises(ValueError):
        minimum_phase(np.ones((3, 3), np.float32))
    with pytest.raises(ValueError):
        minimum_phase(np.ones(1, np.float32))
    with pytest.raises(ValueError):
        minimum_phase(np.ones(64, np.float32), n_fft=32)
