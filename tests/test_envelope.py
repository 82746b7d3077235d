"""envelope() vs scipy.signal.envelope (scipy >= 1.16 semantics).

Sweeps real/complex inputs, band edges (default, pure-positive, negative,
straddling, open), resampling up/down with even/odd lengths, all three
residual modes, squared mode, batch + axis handling.
"""

import numpy as np
import pytest
import scipy.signal as ss

import fft_wgpu_tpu as ft

RTOL = dict(rtol=2e-4, atol=2e-5)


def _sig(n, cplx, seed=0, batch=()):
    rng = np.random.default_rng(seed)
    shape = batch + (n,)
    x = rng.standard_normal(shape)
    if cplx:
        x = x + 1j * rng.standard_normal(shape)
        return x.astype(np.complex64)
    return x.astype(np.float32)


@pytest.mark.parametrize("cplx", [False, True])
@pytest.mark.parametrize("n", [64, 65])
@pytest.mark.parametrize("bp", [(1, None), (3, 15), (None, None), (2, 20)])
@pytest.mark.parametrize("residual", ["lowpass", "all", None])
def test_envelope_parity(cplx, n, bp, residual):
    x = _sig(n, cplx)
    got = np.asarray(ft.envelope(x, bp, residual=residual))
    want = ss.envelope(x.astype(np.complex128 if cplx else np.float64),
                       bp, residual=residual)
    np.testing.assert_allclose(got, want, **RTOL)


@pytest.mark.parametrize("cplx", [False, True])
@pytest.mark.parametrize("bp", [(-10, -2), (-8, 9)])
def test_envelope_negative_bands(cplx, bp):
    x = _sig(64, cplx, seed=1)
    got = np.asarray(ft.envelope(x, bp))
    want = ss.envelope(x.astype(np.complex128 if cplx else np.float64), bp)
    np.testing.assert_allclose(got, want, **RTOL)


@pytest.mark.parametrize("cplx", [False, True])
@pytest.mark.parametrize("n,n_out", [(64, 32), (64, 96), (64, 33),
                                     (65, 32), (65, 128), (63, 48)])
@pytest.mark.parametrize("residual", ["lowpass", "all"])
def test_envelope_resampled(cplx, n, n_out, residual):
    x = _sig(n, cplx, seed=2)
    got = np.asarray(ft.envelope(x, (2, 14), n_out=n_out, residual=residual))
    want = ss.envelope(x.astype(np.complex128 if cplx else np.float64),
                       (2, 14), n_out=n_out, residual=residual)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, **RTOL)


def test_envelope_squared_and_batch_axis():
    x = _sig(64, False, seed=3, batch=(3, 2))
    got = np.asarray(ft.envelope(x, (1, 20), squared=True, axis=-1))
    want = ss.envelope(x.astype(np.float64), (1, 20), squared=True, axis=-1)
    np.testing.assert_allclose(got, want, **RTOL)
    # non-default axis
    xt = np.swapaxes(x, 0, 2)
    got = np.asarray(ft.envelope(xt, (1, 20), axis=0))
    want = ss.envelope(xt.astype(np.float64), (1, 20), axis=0)
    np.testing.assert_allclose(got, want, **RTOL)


def test_envelope_am_signal_recovers_modulation():
    # analytic sanity: AM carrier -> envelope == modulation depth
    n = 512
    t = np.arange(n) / n
    a = 1.0 + 0.5 * np.cos(2 * np.pi * 4 * t)
    x = (a * np.cos(2 * np.pi * 64 * t)).astype(np.float32)
    env, _ = ft.envelope(x, (32, 96))
    np.testing.assert_allclose(np.asarray(env), a, atol=1e-3)


def test_envelope_validation():
    x = _sig(32, False)
    with pytest.raises(ValueError):
        ft.envelope(x, (5, 3))
    with pytest.raises(ValueError):
        ft.envelope(x, (1, None), residual="bogus")
    with pytest.raises(ValueError):
        ft.envelope(x, (1, None), n_out=-4)
    with pytest.raises(ValueError):
        ft.envelope(x, (1, 2, 3))
