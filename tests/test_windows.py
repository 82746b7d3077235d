"""Window zoo vs scipy.signal.windows oracles.

The reference has no window functions (SURVEY §2 — bare batched FFT);
these back the get_window surface of ops/spectral_est.py /
ops/short_time_fft.py.  Every window is checked against scipy in both
symmetric and periodic (fftbins) forms at even/odd lengths.
"""

import numpy as np
import pytest
import scipy.signal.windows as sw

import fft_wgpu_tpu as ft
from fft_wgpu_tpu.ops.spectral_est import get_window

LENGTHS = [8, 9, 64, 65, 127, 128]

# (ours, scipy name, args) — zero-parameter windows
PLAIN = [
    (ft.boxcar_window, "boxcar", ()),
    (ft.triang_window, "triang", ()),
    (ft.parzen_window, "parzen", ()),
    (ft.bohman_window, "bohman", ()),
    (ft.nuttall_window, "nuttall", ()),
    (ft.blackmanharris_window, "blackmanharris", ()),
    (ft.cosine_window, "cosine", ()),
    (ft.barthann_window, "barthann", ()),
    (ft.lanczos_window, "lanczos", ()),
]

PARAM = [
    (ft.gaussian_window, "gaussian", (7.0,)),
    (ft.general_gaussian_window, "general_gaussian", (1.5, 7.0)),
    (ft.general_cosine_window, "general_cosine", ([0.4, 0.5, 0.1],)),
    (ft.general_hamming_window, "general_hamming", (0.7,)),
    (ft.chebwin_window, "chebwin", (80.0,)),
    (ft.taylor_window, "taylor", (4, 30.0)),
]


@pytest.mark.parametrize("n", LENGTHS)
@pytest.mark.parametrize("fn,name,args", PLAIN + PARAM)
def test_window_scipy_parity(fn, name, args, n):
    ref = getattr(sw, name)
    for periodic in (False, True):
        got = np.asarray(fn(n, *args, periodic=periodic))
        want = ref(n, *args, sym=not periodic)
        np.testing.assert_allclose(got, want, atol=4e-6, err_msg=f"{name} n={n} periodic={periodic}")


@pytest.mark.parametrize("n", LENGTHS)
def test_exponential_window(n):
    for periodic in (False, True):
        got = np.asarray(ft.exponential_window(n, None, 3.0, periodic=periodic))
        want = sw.exponential(n, None, 3.0, sym=not periodic)
        np.testing.assert_allclose(got, want, atol=4e-6)
    # explicit center (periodic only — scipy allows center only with sym=False)
    got = np.asarray(ft.exponential_window(n, 2.0, 3.0, periodic=True))
    want = sw.exponential(n, 2.0, 3.0, sym=False)
    np.testing.assert_allclose(got, want, atol=4e-6)
    with pytest.raises(ValueError):
        ft.exponential_window(n, 2.0, 3.0)


@pytest.mark.parametrize("n", [8, 64, 128])
def test_kbd_window(n):
    got = np.asarray(ft.kaiser_bessel_derived_window(n, 8.6))
    want = sw.kaiser_bessel_derived(n, 8.6, sym=True)
    np.testing.assert_allclose(got, want, atol=4e-6)


def test_kbd_rejects_odd_and_periodic():
    with pytest.raises(ValueError):
        ft.kaiser_bessel_derived_window(9, 8.6)
    with pytest.raises(ValueError):
        ft.kaiser_bessel_derived_window(8, 8.6, periodic=True)


def test_kbd_princen_bradley():
    # w[k]^2 + w[k+N/2]^2 == 1 — the TDAC property that makes KBD an MDCT
    # window (ops/mdct.py).
    w = np.asarray(ft.kaiser_bessel_derived_window(128, 8.6), np.float64)
    np.testing.assert_allclose(w[:64] ** 2 + w[64:] ** 2, 1.0, atol=1e-5)


def test_get_window_new_names():
    for name in ("triang", "parzen", "bohman", "nuttall", "blackmanharris",
                 "cosine", "barthann", "lanczos", "exponential"):
        got = np.asarray(get_window(name, 65, periodic=True))
        want = sw.get_window(name, 65, fftbins=True)
        np.testing.assert_allclose(got, want, atol=4e-6, err_msg=name)


def test_get_window_tuples():
    cases = [
        (("gaussian", 7.0), ("gaussian", 7.0)),
        (("chebwin", 80.0), ("chebwin", 80.0)),
        (("general_hamming", 0.7), ("general_hamming", 0.7)),
        (("taylor", 4, 30.0), ("taylor", 4, 30.0)),
        (("exponential", None, 3.0), ("exponential", None, 3.0)),
    ]
    for ours, theirs in cases:
        got = np.asarray(get_window(ours, 64, periodic=True))
        want = sw.get_window(theirs, 64, fftbins=True)
        np.testing.assert_allclose(got, want, atol=4e-6, err_msg=str(ours))


def test_get_window_param_window_as_string_raises():
    with pytest.raises(ValueError, match="requires parameters"):
        get_window("chebwin", 64)


def test_chebwin_low_attenuation_warns():
    with pytest.warns(UserWarning):
        ft.chebwin_window(64, 40.0)


def test_get_window_scipy_fftbins_arg():
    """scipy spells periodic= as fftbins= (positional third arg) — both
    must work for drop-in call sites (round-3 parity fuzz)."""
    import scipy.signal as ss

    for w in ("hann", "tukey", "taylor", "exponential"):
        got = np.asarray(get_window(w, 65, True))
        want = ss.get_window(w, 65, fftbins=True)
        assert np.allclose(got, want, atol=1e-6), w
        got_sym = np.asarray(get_window(w, 64, fftbins=False))
        want_sym = ss.get_window(w, 64, fftbins=False)
        assert np.allclose(got_sym, want_sym, atol=1e-6), w


def test_hilbert_scipy_N_kwarg(rng):
    """scipy.signal.hilbert spells the length argument N= (round-3
    parity fuzz); n= stays supported, passing both mismatched raises."""
    import scipy.signal as ss

    x = rng.standard_normal(500).astype(np.float32)
    got = np.asarray(ft.hilbert(x, N=512))
    want = ss.hilbert(x.astype(np.float64), N=512)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-4
    with pytest.raises(ValueError):
        ft.hilbert(x, n=256, N=512)
