"""Multirate ops vs the scipy.signal oracle (firwin / upfirdn /
resample_poly — reference has no filtering at all, SURVEY §2)."""

import numpy as np
import pytest
import scipy.signal as sps

from fft_wgpu_tpu.ops.multirate import (
    decimate,
    firwin,
    firwin2,
    kaiser_atten,
    kaiser_beta,
    resample_poly,
    upfirdn,
)


def rel(a, b):
    a = np.asarray(a)
    b = np.asarray(b)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-30)


# ---------------------------------------------------------------------------
# firwin (design is f64 except the f32 window table)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("numtaps,cutoff,kwargs", [
    (31, 0.3, {}),
    (32, 0.5, {}),
    (31, [0.2, 0.6], {"pass_zero": False}),       # bandpass
    (33, [0.1, 0.4], {}),                         # bandstop-ish (pass_zero)
    (31, 0.4, {"pass_zero": "highpass"}),
    (64, 0.25, {"window": ("kaiser", 8.0)}),
    (21, 0.3, {"window": "blackman"}),
    (55, 0.35, {"width": 0.05}),                  # kaiser via width
    (31, 1000.0, {"fs": 8000.0}),
])
def test_firwin_matches_scipy(numtaps, cutoff, kwargs):
    ours = firwin(numtaps, cutoff, **kwargs)
    theirs = sps.firwin(numtaps, cutoff, **kwargs)
    assert rel(ours, theirs) < 5e-6  # window tables are f32


def test_firwin_validation():
    with pytest.raises(ValueError):
        firwin(30, 0.5, pass_zero=False)  # even taps passing nyquist
    with pytest.raises(ValueError):
        firwin(31, [0.5, 0.2])
    with pytest.raises(ValueError):
        firwin(31, 1.5)
    with pytest.raises(ValueError):
        firwin(31, [0.2, 0.4], pass_zero="lowpass")


def test_kaiser_helpers():
    assert np.isclose(kaiser_atten(211, 0.0375),
                      sps.kaiser_atten(211, 0.0375))
    for a in (10.0, 30.0, 65.0):
        assert np.isclose(kaiser_beta(a), sps.kaiser_beta(a))


# ---------------------------------------------------------------------------
# upfirdn
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("up,down,n,n_h", [
    (1, 1, 50, 7),
    (3, 1, 50, 11),
    (1, 4, 100, 9),
    (3, 5, 64, 21),
    (7, 2, 33, 16),
    (2, 2, 128, 31),
])
def test_upfirdn_real(up, down, n, n_h):
    rng = np.random.default_rng(42)
    x = rng.standard_normal(n).astype(np.float32)
    h = rng.standard_normal(n_h)
    ours = np.asarray(upfirdn(h, x, up, down))
    theirs = sps.upfirdn(h, x.astype(np.float64), up, down)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 2e-5


def test_upfirdn_batched_axis():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 60, 3)).astype(np.float32)
    h = rng.standard_normal(13)
    ours = np.asarray(upfirdn(h, x, 2, 3, axis=1))
    theirs = sps.upfirdn(h, x.astype(np.float64), 2, 3, axis=1)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 2e-5


def test_upfirdn_complex():
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(48) + 1j * rng.standard_normal(48)).astype(
        np.complex64)
    h = rng.standard_normal(9) + 1j * rng.standard_normal(9)
    ours = np.asarray(upfirdn(h, x, 2, 3))
    theirs = sps.upfirdn(h, x.astype(np.complex128), 2, 3)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 2e-5


@pytest.mark.parametrize("mode", [
    "constant", "edge", "wrap", "symmetric", "reflect",
    "antisymmetric", "antireflect", "smooth",
])
def test_upfirdn_modes(mode):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(40).astype(np.float32)
    h = rng.standard_normal(11)
    cval = 1.5 if mode == "constant" else 0.0
    ours = np.asarray(upfirdn(h, x, 2, 3, mode=mode, cval=cval))
    theirs = sps.upfirdn(h, x.astype(np.float64), 2, 3, mode=mode, cval=cval)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 2e-5


# ---------------------------------------------------------------------------
# resample_poly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 2), (2, 3),
                                     (7, 3), (160, 147)])
def test_resample_poly_matches_scipy(up, down):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(200).astype(np.float32)
    ours = np.asarray(resample_poly(x, up, down))
    theirs = sps.resample_poly(x.astype(np.float64), up, down)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


@pytest.mark.parametrize("padtype,cval", [
    ("constant", None), ("constant", 2.0), ("mean", None),
    ("median", None), ("maximum", None), ("minimum", None),
    ("edge", None), ("wrap", None),
])
def test_resample_poly_padtypes(padtype, cval):
    rng = np.random.default_rng(4)
    x = (rng.standard_normal(120) + 3.0).astype(np.float32)
    ours = np.asarray(resample_poly(x, 3, 4, padtype=padtype, cval=cval))
    theirs = sps.resample_poly(x.astype(np.float64), 3, 4,
                               padtype=padtype, cval=cval)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


def test_resample_poly_axis_and_window_array():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((70, 5)).astype(np.float32)
    w = sps.firwin(41, 1.0 / 3.0)
    ours = np.asarray(resample_poly(x, 3, 1, axis=0, window=w))
    theirs = sps.resample_poly(x.astype(np.float64), 3, 1, axis=0, window=w)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


def test_resample_poly_complex():
    rng = np.random.default_rng(6)
    x = (rng.standard_normal(96) + 1j * rng.standard_normal(96)).astype(
        np.complex64)
    ours = np.asarray(resample_poly(x, 2, 3))
    theirs = sps.resample_poly(x.astype(np.complex128), 2, 3)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


def test_resample_poly_identity():
    x = np.arange(10, dtype=np.float32)
    assert np.allclose(np.asarray(resample_poly(x, 5, 5)), x)


# ---------------------------------------------------------------------------
# firwin2 / decimate / detrend / correlation_lags
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("numtaps,freq,gain,kwargs", [
    (41, [0.0, 0.5, 1.0], [1.0, 1.0, 0.0], {}),
    (40, [0.0, 0.5, 1.0], [1.0, 1.0, 0.0], {}),          # type II
    (41, [0.0, 0.3, 0.3, 1.0], [1.0, 1.0, 0.0, 0.0], {}),  # repeated freq
    (41, [0.0, 0.5, 1.0], [0.0, 1.0, 0.0],
     {"antisymmetric": True}),                            # type III
    (40, [0.0, 0.5, 1.0], [0.0, 1.0, 1.0],
     {"antisymmetric": True}),                            # type IV
    (33, [0.0, 1000.0, 4000.0], [1.0, 0.5, 0.0], {"fs": 8000.0}),
])
def test_firwin2_matches_scipy(numtaps, freq, gain, kwargs):
    ours = firwin2(numtaps, freq, gain, **kwargs)
    theirs = sps.firwin2(numtaps, freq, gain, **kwargs)
    assert rel(ours, theirs) < 5e-6


def test_firwin2_validation():
    with pytest.raises(ValueError):
        firwin2(40, [0.0, 0.5, 1.0], [1.0, 1.0, 0.5])  # type II nyquist
    with pytest.raises(ValueError):
        firwin2(41, [0.1, 0.5, 1.0], [1.0, 1.0, 0.0])  # must start at 0
    with pytest.raises(ValueError):
        firwin2(41, [0.0, 0.3, 0.3, 0.3, 1.0], [1.0, 1.0, 0.5, 0.0, 0.0])


@pytest.mark.parametrize("q,zero_phase", [(2, True), (5, True), (3, False)])
def test_decimate_matches_scipy(q, zero_phase):
    rng = np.random.default_rng(9)
    x = rng.standard_normal(240).astype(np.float32)
    ours = np.asarray(decimate(x, q, ftype="fir", zero_phase=zero_phase))
    theirs = sps.decimate(x.astype(np.float64), q, ftype="fir",
                          zero_phase=zero_phase)
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


def test_decimate_iir_raises():
    with pytest.raises(NotImplementedError):
        decimate(np.zeros(16, np.float32), 2, ftype="iir")


def test_correlation_lags_matches_scipy():
    from fft_wgpu_tpu import correlation_lags
    for mode in ("full", "same", "valid"):
        for l1, l2 in [(10, 10), (10, 4), (4, 10), (7, 5)]:
            np.testing.assert_array_equal(
                correlation_lags(l1, l2, mode),
                sps.correlation_lags(l1, l2, mode))


@pytest.mark.parametrize("kind,bp", [
    ("constant", 0), ("linear", 0), ("linear", [20, 50]),
])
def test_detrend_matches_scipy(kind, bp):
    from fft_wgpu_tpu import detrend
    rng = np.random.default_rng(11)
    t = np.arange(80, dtype=np.float64)
    x = (0.3 * t + 5.0 + rng.standard_normal(80)).astype(np.float32)
    ours = np.asarray(detrend(x, type=kind, bp=bp))
    theirs = sps.detrend(x.astype(np.float64), type=kind, bp=bp)
    assert np.allclose(ours, theirs, atol=1e-4)


def test_detrend_axis_and_complex():
    from fft_wgpu_tpu import detrend
    rng = np.random.default_rng(12)
    x = rng.standard_normal((3, 40, 2)).astype(np.float32) + 2.0
    ours = np.asarray(detrend(x, axis=1))
    theirs = sps.detrend(x.astype(np.float64), axis=1)
    assert np.allclose(ours, theirs, atol=1e-4)
    z = (rng.standard_normal(50) + 1j * rng.standard_normal(50)
         + (3 + 4j)).astype(np.complex64)
    ours = np.asarray(detrend(z, type="constant"))
    theirs = sps.detrend(z.astype(np.complex128), type="constant")
    assert np.allclose(ours, theirs, atol=1e-4)


def test_upfirdn_antisymmetric_short_signal():
    # signal shorter than the filter: the odd reflection folds repeatedly
    rng = np.random.default_rng(13)
    x = rng.standard_normal(20).astype(np.float32)
    h = rng.standard_normal(41)
    ours = np.asarray(upfirdn(h, x, 2, 3, mode="antisymmetric"))
    theirs = sps.upfirdn(h, x.astype(np.float64), 2, 3, mode="antisymmetric")
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 2e-5


def test_firwin_band_string_validation():
    with pytest.raises(ValueError):
        firwin(31, 0.3, pass_zero="bandpass")  # needs two cutoffs
    with pytest.raises(ValueError):
        firwin(31, 0.3, pass_zero="bandstop")


def test_resample_poly_complex_mean_padtype():
    rng = np.random.default_rng(14)
    z = (rng.standard_normal(90) + 1j * rng.standard_normal(90)
         + (2 - 1j)).astype(np.complex64)
    ours = np.asarray(resample_poly(z, 2, 3, padtype="mean"))
    theirs = sps.resample_poly(z.astype(np.complex128), 2, 3, padtype="mean")
    assert ours.shape == theirs.shape
    assert rel(ours, theirs) < 5e-5


def test_firwin_f64_design_accuracy():
    # the standard design windows are generated in f64: taps must match
    # scipy to ~1e-12, not just f32 accuracy
    for w in ("hamming", "hann", "blackman", ("kaiser", 6.5)):
        ours = firwin(41, 0.3, window=w)
        theirs = sps.firwin(41, 0.3, window=w)
        assert rel(ours, theirs) < 1e-12, w


def test_freqz_matches_scipy():
    b = sps.firwin(31, 0.4)
    w1, h1 = __import__("fft_wgpu_tpu").freqz(b)
    w2, h2 = sps.freqz(b)
    assert np.allclose(w1, w2) and np.allclose(h1, h2, atol=1e-12)
    # IIR + whole + fs + explicit grid
    bb, aa = [1.0, -0.5], [1.0, 0.2, 0.1]
    w1, h1 = __import__("fft_wgpu_tpu").freqz(bb, aa, worN=256, whole=True)
    w2, h2 = sps.freqz(bb, aa, worN=256, whole=True)
    assert np.allclose(h1, h2, atol=1e-12)
    grid = np.linspace(10, 400, 17)
    w1, h1 = __import__("fft_wgpu_tpu").freqz(bb, aa, worN=grid, fs=1000.0)
    w2, h2 = sps.freqz(bb, aa, worN=grid, fs=1000.0)
    assert np.allclose(w1, w2) and np.allclose(h1, h2, atol=1e-12)


def test_group_delay_matches_scipy():
    from fft_wgpu_tpu import group_delay

    b = sps.firwin(31, 0.4)
    w1, g1 = group_delay((b, [1.0]), 128)
    w2, g2 = sps.group_delay((b, [1.0]), 128)
    assert np.allclose(g1, g2, atol=1e-9)
    # linear-phase FIR: constant delay (numtaps-1)/2 away from the
    # singular stopband nulls
    assert abs(g1[1] - 15.0) < 1e-6
    bb, aa = [1.0, -0.5], [1.0, 0.2, 0.1]
    w1, g1 = group_delay((bb, aa), 64)
    w2, g2 = sps.group_delay((bb, aa), 64)
    assert np.allclose(g1, g2, atol=1e-9)


# ---------------------------------------------------------------------------
# firls / remez / kaiserord (host-f64 design vs the scipy oracle)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("numtaps,bands,desired,kwargs", [
    (31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], {}),
    (51, [0, 0.1, 0.2, 0.4, 0.45, 1.0], [0, 0, 1, 1, 0, 0],
     {"weight": [1.0, 2.0, 0.5]}),
    (73, [0, 200, 250, 500], [1, 0.5, 0, 0], {"fs": 1000.0}),
    (11, [0, 0.5, 0.6, 1.0], [1, 1, 0, 0], {"weight": [1, 10]}),
])
def test_firls_matches_scipy(numtaps, bands, desired, kwargs):
    from fft_wgpu_tpu.ops.multirate import firls

    ours = firls(numtaps, bands, desired, **kwargs)
    ref = sps.firls(numtaps, bands, desired, **kwargs)
    assert rel(ours, ref) < 1e-12


def test_firls_validation():
    from fft_wgpu_tpu.ops.multirate import firls

    with pytest.raises(ValueError):
        firls(30, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0])  # even numtaps
    with pytest.raises(ValueError):
        firls(31, [0, 0.3, 0.2, 1.0], [1, 1, 0, 0])  # non-monotonic
    with pytest.raises(ValueError):
        firls(31, [0, 0.2, 0.3, 1.0], [1, 1, 0, 0], weight=[1, 2, 3])


@pytest.mark.parametrize("numtaps,bands,desired,kwargs", [
    (72, [0, 0.1, 0.11, 0.5], [1, 0], {}),                       # type I-ish
    (21, [0, 0.1, 0.15, 0.5], [1, 0], {}),
    (65, [0, 0.075, 0.1, 0.2, 0.225, 0.5], [0, 1, 0],
     {"weight": [1, 2, 5]}),
    (40, [0, 0.1, 0.125, 0.5], [1, 0], {}),                      # type II
    (31, [0.025, 0.475], [1], {"type": "hilbert"}),              # type III
    (20, [0.025, 0.475], [1], {"type": "hilbert"}),              # type IV
    (55, [0, 0.05, 0.08, 0.15, 0.18, 0.3, 0.33, 0.5],
     [1, 0, 0.5, 0], {"weight": [1, 10, 3, 10]}),
    (53, [0, 300, 400, 1000], [1, 0], {"fs": 2000.0}),
    (255, [0, 0.2, 0.21, 0.5], [1, 0], {}),
])
def test_remez_matches_scipy(numtaps, bands, desired, kwargs):
    from fft_wgpu_tpu.ops.multirate import remez

    ours = remez(numtaps, bands, desired, **kwargs)
    ref = sps.remez(numtaps, bands, desired, **kwargs)
    assert rel(ours, ref) < 1e-10


def test_remez_differentiator_equiripple():
    """Narrow-band differentiator: intrinsically ill-conditioned tap
    recovery (scipy and ours legitimately differ at ~1e-4 taps); the
    correctness criterion is the weighted equiripple error itself, where
    the extremal-value reconstruction beats scipy's sampled one."""
    from fft_wgpu_tpu.ops.multirate import remez

    numtaps, bands, slope = 25, [0.025, 0.225], 2.0
    h = remez(numtaps, bands, [slope], type="differentiator")
    ref = sps.remez(numtaps, bands, [slope], type="differentiator")
    f = np.linspace(bands[0], bands[1], 20001)
    _, H = sps.freqz(h, worN=2 * np.pi * f)
    _, Hr = sps.freqz(ref, worN=2 * np.pi * f)
    ours_rip = np.max(np.abs(np.abs(H) - slope * f) / f)
    scipy_rip = np.max(np.abs(np.abs(Hr) - slope * f) / f)
    assert ours_rip <= scipy_rip * 1.5
    assert ours_rip < 1e-9


def test_remez_validation():
    from fft_wgpu_tpu.ops.multirate import remez

    with pytest.raises(ValueError):
        remez(31, [0, 0.6], [1])                # edge above fs/2
    with pytest.raises(ValueError):
        remez(31, [0, 0.2, 0.3, 0.5], [1])      # desired size mismatch
    with pytest.raises(ValueError):
        remez(31, [0, 0.2, 0.3, 0.5], [1, 0], type="nope")


def test_kaiserord_matches_scipy():
    from fft_wgpu_tpu.ops.multirate import kaiserord

    for ripple, width in [(65, 0.05), (21.5, 0.1), (10, 0.02), (80, 0.01)]:
        assert kaiserord(ripple, width) == sps.kaiserord(ripple, width)
    with pytest.raises(ValueError):
        kaiserord(5, 0.1)
