"""Differential parity fuzz vs scipy/numpy (VERDICT r3 item 8).

The round-3 `resample` incident (a scipy-parity rewrite landed with stale
tests and a changed axis default) showed that parity surfaces can drift
untested.  This file draws SEEDED random shapes / axes / kwargs per entry
point and compares ~20 public signal-surface functions against their
scipy/numpy oracles on every run of the default suite.  Reps are kept
small so the whole file stays well under a minute on the CPU backend.

Validation that the fuzz has teeth: an injected `axis=-1 -> axis=0`
default mutation in `resample` and a `norm` default mutation in `dct`
were both caught on the first rep when tried during development.

Reference test-strategy anchor: the reference's only oracle is rustfft at
one shape with constant input (fft_wgpu examples/basic_inverse.rs:219-253);
this is the randomized, multi-op, multi-shape regime SURVEY §4 calls for.
"""

from __future__ import annotations

import zlib

import numpy as np
import pytest
import scipy.fft as sfft
import scipy.signal as sig

import fft_wgpu_tpu as ftt

REPS = 2  # per-op fuzz repetitions per seed


def rel_l2(got, want) -> float:
    got = np.asarray(got, dtype=np.complex128)
    want = np.asarray(want, dtype=np.complex128)
    denom = np.linalg.norm(want.ravel())
    if denom == 0:
        return float(np.linalg.norm(got.ravel()))
    return float(np.linalg.norm((got - want).ravel()) / denom)


def _arr(rng, shape, cplx=False):
    x = rng.standard_normal(shape)
    if cplx:
        x = x + 1j * rng.standard_normal(shape)
        return x.astype(np.complex64)
    return x.astype(np.float32)


def _shape(rng, ndim=None, lo=4, hi=48):
    ndim = ndim or int(rng.integers(1, 3))
    return tuple(int(rng.integers(lo, hi)) for _ in range(ndim))


# --------------------------------------------------------------------- #
# case table: name -> fn(rng) returning (got, want, tol)
# --------------------------------------------------------------------- #

def _case_fft(rng):
    x = _arr(rng, _shape(rng), cplx=bool(rng.integers(2)))
    kw = {}
    if rng.integers(2):
        kw["axis"] = int(rng.integers(-x.ndim, x.ndim))
    if rng.integers(2):
        kw["norm"] = str(rng.choice(["ortho", "forward", "backward"]))
    return ftt.fft(x, **kw), np.fft.fft(x, **kw), 1e-4


def _case_ifft(rng):
    x = _arr(rng, _shape(rng), cplx=True)
    ax = int(rng.integers(-x.ndim, x.ndim))
    return ftt.ifft(x, axis=ax), np.fft.ifft(x, axis=ax), 1e-4


def _case_rfft(rng):
    x = _arr(rng, _shape(rng))
    kw = {}
    if rng.integers(2):
        kw["axis"] = int(rng.integers(-x.ndim, x.ndim))
    return ftt.rfft(x, **kw), np.fft.rfft(x, **kw), 1e-4


def _case_irfft(rng):
    x = _arr(rng, _shape(rng), cplx=True)
    ax = int(rng.integers(-x.ndim, x.ndim))
    n = int(rng.integers(4, 40))
    return (ftt.irfft(x, n=n, axis=ax),
            np.fft.irfft(x, n=n, axis=ax), 1e-4)


def _case_fft2(rng):
    x = _arr(rng, _shape(rng, 2), cplx=bool(rng.integers(2)))
    return ftt.fft2(x), np.fft.fft2(x), 1e-4


def _case_fftn(rng):
    x = _arr(rng, _shape(rng, 3, 4, 14), cplx=True)
    k = int(rng.integers(1, 4))
    axes = tuple(int(a) for a in
                 rng.choice(3, size=k, replace=False))
    return (ftt.fftn(x, axes=axes),
            np.fft.fftn(x, axes=axes), 1e-4)


def _case_dct(rng):
    x = _arr(rng, _shape(rng))
    kw = {}
    if rng.integers(2):
        kw["type"] = int(rng.choice([1, 2, 3, 4]))
    if rng.integers(2):
        kw["axis"] = int(rng.integers(-x.ndim, x.ndim))
    if rng.integers(2):
        kw["norm"] = str(rng.choice(["ortho", "forward", "backward"]))
    return (ftt.dct(x, **kw),
            sfft.dct(x.astype(np.float64), **kw), 2e-4)


def _case_dst(rng):
    x = _arr(rng, _shape(rng))
    ax = int(rng.integers(-x.ndim, x.ndim))
    typ = int(rng.choice([1, 2, 3, 4]))
    norm = rng.choice([None, "ortho", "forward", "backward"])
    norm = None if norm is None else str(norm)
    return (ftt.dst(x, type=typ, axis=ax, norm=norm),
            sfft.dst(x.astype(np.float64), type=typ, axis=ax, norm=norm),
            2e-4)


def _case_hilbert(rng):
    x = _arr(rng, _shape(rng))
    kw = {}
    if rng.integers(2):
        kw["axis"] = int(rng.integers(-x.ndim, x.ndim))
    return ftt.hilbert(x, **kw), sig.hilbert(x, **kw), 1e-4


def _case_resample(rng):
    x = _arr(rng, _shape(rng), cplx=bool(rng.integers(2)))
    num = int(rng.integers(4, 40))
    # kwargs are OMITTED sometimes so the fuzz also pins the DEFAULTS
    # (the round-3 incident was exactly an axis-default change; with the
    # axis always passed explicitly the mutation survives the fuzz —
    # verified by injection during development)
    kw = {}
    if rng.integers(2):
        kw["axis"] = int(rng.integers(-x.ndim, x.ndim))
    if rng.integers(2):
        kw["window"] = "hamming"
    if rng.integers(2):
        kw["domain"] = str(rng.choice(["time", "freq"]))
    return (ftt.resample(x, num, **kw), sig.resample(x, num, **kw), 2e-4)


def _case_resample_poly(rng):
    x = _arr(rng, _shape(rng, lo=8))
    ax = int(rng.integers(-x.ndim, x.ndim))
    up = int(rng.integers(1, 5))
    down = int(rng.integers(1, 5))
    return (ftt.resample_poly(x, up, down, axis=ax),
            sig.resample_poly(x, up, down, axis=ax), 2e-4)


def _case_fftconvolve(rng):
    nd = int(rng.integers(1, 3))
    a = _arr(rng, _shape(rng, nd), cplx=bool(rng.integers(2)))
    b = _arr(rng, _shape(rng, nd, lo=2, hi=12), cplx=bool(rng.integers(2)))
    mode = str(rng.choice(["full", "same", "valid"]))
    if mode == "valid" and any(
            s2 > s1 for s1, s2 in zip(a.shape, b.shape)):
        a, b = b, a
    return (ftt.fftconvolve(a, b, mode=mode),
            sig.fftconvolve(a, b, mode=mode), 2e-4)


def _case_oaconvolve(rng):
    a = _arr(rng, _shape(rng, 1, 40, 200))
    b = _arr(rng, _shape(rng, 1, 4, 24))
    mode = str(rng.choice(["full", "same", "valid"]))
    return (ftt.oaconvolve(a, b, mode=mode),
            sig.oaconvolve(a, b, mode=mode), 2e-4)


def _case_convolve_correlate(rng):
    a = _arr(rng, _shape(rng, 1))
    b = _arr(rng, _shape(rng, 1, lo=2, hi=12))
    mode = str(rng.choice(["full", "same", "valid"]))
    if b.shape[0] > a.shape[0]:
        a, b = b, a
    if rng.integers(2):
        return (ftt.convolve(a, b, mode=mode),
                sig.convolve(a, b, mode=mode), 2e-4)
    return (ftt.correlate(a, b, mode=mode),
            sig.correlate(a, b, mode=mode), 2e-4)


def _case_welch(rng):
    x = _arr(rng, (int(rng.integers(64, 256)),))
    kw = {}
    if rng.integers(2):
        kw["nperseg"] = int(rng.integers(8, 48))
        if rng.integers(2):
            kw["noverlap"] = int(rng.integers(0, kw["nperseg"] // 2))
    if rng.integers(2):
        kw["window"] = str(rng.choice(["hann", "hamming", "boxcar"]))
    if rng.integers(2):
        kw["scaling"] = str(rng.choice(["density", "spectrum"]))
    f1, p1 = ftt.welch(x, **kw)
    f2, p2 = sig.welch(x, **kw)
    assert rel_l2(f1, f2) < 1e-6
    return p1, p2, 2e-4


def _case_csd(rng):
    n = int(rng.integers(64, 200))
    x = _arr(rng, (n,))
    y = _arr(rng, (n,))
    nperseg = int(rng.integers(8, 40))
    f1, p1 = ftt.csd(x, y, nperseg=nperseg)
    f2, p2 = sig.csd(x, y, nperseg=nperseg)
    assert rel_l2(f1, f2) < 1e-6
    return p1, p2, 2e-4


def _case_spectrogram(rng):
    x = _arr(rng, (int(rng.integers(96, 256)),))
    nperseg = int(rng.integers(8, 32))
    mode = str(rng.choice(["psd", "magnitude"]))
    f1, t1, s1 = ftt.spectrogram(x, nperseg=nperseg, mode=mode)
    f2, t2, s2 = sig.spectrogram(x, nperseg=nperseg, mode=mode)
    assert rel_l2(t1, t2) < 1e-6
    return s1, s2, 2e-4


def _case_czt(rng):
    x = _arr(rng, (int(rng.integers(8, 48)),), cplx=True)
    m = int(rng.integers(4, 32))
    return ftt.czt(x, m=m), sig.czt(x, m=m), 2e-4


def _case_get_window(rng):
    name = rng.choice(["hann", "hamming", "blackman", "bartlett",
                       "flattop", "nuttall", "triang", "cosine"])
    n = int(rng.integers(4, 64))
    fftbins = bool(rng.integers(2))
    return (ftt.get_window(str(name), n, fftbins=fftbins),
            sig.get_window(str(name), n, fftbins=fftbins), 1e-5)


def _case_detrend(rng):
    x = _arr(rng, _shape(rng))
    ax = int(rng.integers(-x.ndim, x.ndim))
    typ = str(rng.choice(["linear", "constant"]))
    return (ftt.detrend(x, axis=ax, type=typ),
            sig.detrend(x.astype(np.float64), axis=ax, type=typ), 2e-4)


def _case_dctn(rng):
    x = _arr(rng, _shape(rng, 2))
    typ = int(rng.choice([2, 3]))
    norm = rng.choice([None, "ortho"])
    norm = None if norm is None else str(norm)
    return (ftt.dctn(x, type=typ, norm=norm),
            sfft.dctn(x.astype(np.float64), type=typ, norm=norm), 2e-4)


def _case_hilbert2(rng):
    x = _arr(rng, _shape(rng, 2))
    return ftt.hilbert2(x), sig.hilbert2(x), 1e-4


def _case_firwin(rng):
    numtaps = int(rng.integers(3, 40))
    cutoff = float(rng.uniform(0.05, 0.45))
    window = str(rng.choice(["hamming", "hann", "blackman"]))
    return (ftt.firwin(numtaps, cutoff, window=window),
            sig.firwin(numtaps, cutoff, window=window), 1e-5)


def _case_upfirdn(rng):
    x = _arr(rng, (int(rng.integers(8, 48)),))
    h = _arr(rng, (int(rng.integers(2, 9)),))
    up = int(rng.integers(1, 4))
    down = int(rng.integers(1, 4))
    return (ftt.upfirdn(h, x, up=up, down=down),
            sig.upfirdn(h, x, up=up, down=down), 2e-4)


_CASES = {
    "fft": _case_fft,
    "ifft": _case_ifft,
    "rfft": _case_rfft,
    "irfft": _case_irfft,
    "fft2": _case_fft2,
    "fftn": _case_fftn,
    "dct": _case_dct,
    "dst": _case_dst,
    "dctn": _case_dctn,
    "hilbert": _case_hilbert,
    "hilbert2": _case_hilbert2,
    "resample": _case_resample,
    "resample_poly": _case_resample_poly,
    "fftconvolve": _case_fftconvolve,
    "oaconvolve": _case_oaconvolve,
    "convolve_correlate": _case_convolve_correlate,
    "welch": _case_welch,
    "csd": _case_csd,
    "spectrogram": _case_spectrogram,
    "czt": _case_czt,
    "get_window": _case_get_window,
    "detrend": _case_detrend,
    "firwin": _case_firwin,
    "upfirdn": _case_upfirdn,
}




# ---- second fuzz wave (round 4): more scipy-surface entry points ---- #

def _case_periodogram(rng):
    x = _arr(rng, (int(rng.integers(64, 256)),))
    kw = {}
    if rng.integers(2):
        kw["window"] = str(rng.choice(["boxcar", "hann", "hamming"]))
    if rng.integers(2):
        kw["nfft"] = int(rng.integers(len(x), 2 * len(x)))
    f1, p1 = ftt.periodogram(x, **kw)
    f2, p2 = sig.periodogram(x, **kw)
    assert rel_l2(f1, f2) < 1e-6
    return p1, p2, 2e-4


def _case_coherence(rng):
    n = int(rng.integers(128, 300))
    x = _arr(rng, (n,))
    y = x + 0.5 * _arr(rng, (n,))
    nperseg = int(rng.integers(16, 48))
    f1, c1 = ftt.coherence(x, y, nperseg=nperseg)
    f2, c2 = sig.coherence(x, y, nperseg=nperseg)
    assert rel_l2(f1, f2) < 1e-6
    return c1, c2, 5e-4


def _case_decimate(rng):
    x = _arr(rng, (int(rng.integers(64, 256)),))
    q = int(rng.integers(2, 6))
    # FIR only: scipy's default IIR path is out of this library's scope
    return (ftt.decimate(x, q, ftype="fir"),
            sig.decimate(x.astype(np.float64), q, ftype="fir"), 2e-4)


def _case_savgol(rng):
    x = _arr(rng, (int(rng.integers(32, 128)),))
    wl = int(rng.integers(3, 12)) | 1  # odd window
    po = int(rng.integers(1, min(wl - 1, 5)))
    deriv = int(rng.integers(0, min(po + 1, 3)))
    return (ftt.savgol_filter(x, wl, po, deriv=deriv),
            sig.savgol_filter(x.astype(np.float64), wl, po, deriv=deriv),
            5e-4)


def _case_wiener(rng):
    x = _arr(rng, (int(rng.integers(16, 48)),
                   int(rng.integers(16, 48))))
    ms = int(rng.integers(1, 4)) * 2 + 1
    return (ftt.wiener(x, mysize=ms),
            sig.wiener(x.astype(np.float64), mysize=ms), 5e-4)


def _case_cepstrum(rng):
    # minimum-phase-ish signal keeps the complex cepstrum well-defined
    n = int(rng.integers(32, 96))
    x = _arr(rng, (n,)) * (0.8 ** np.arange(n, dtype=np.float32))
    x[0] += 5.0
    if rng.integers(2):
        from scipy.signal import hilbert as _h  # noqa: F401
        got = ftt.real_cepstrum(x)
        X = np.fft.fft(x.astype(np.float64))
        want = np.fft.ifft(np.log(np.abs(X))).real
        return got, want, 1e-3
    got, _nd = ftt.complex_cepstrum(x)
    X = np.fft.fft(x.astype(np.float64))
    # scipy-style unwrapped-phase cepstrum
    ndelay = int(np.round(np.unwrap(np.angle(X))[n // 2] / np.pi))
    unw = np.unwrap(np.angle(X)) + np.pi * ndelay * np.arange(n) * 2 / n
    want = np.fft.ifft(np.log(np.abs(X)) + 1j * unw).real
    return got, want, 1e-3


def _case_fftshift(rng):
    x = _arr(rng, _shape(rng, 2))
    axes = None if rng.integers(2) else (int(rng.integers(0, 2)),)
    if rng.integers(2):
        return (ftt.fftshift(x, axes=axes),
                np.fft.fftshift(x, axes=axes), 0.0 + 1e-12)
    return (ftt.ifftshift(x, axes=axes),
            np.fft.ifftshift(x, axes=axes), 0.0 + 1e-12)


def _case_dht(rng):
    x = _arr(rng, (int(rng.integers(16, 200)),))
    H = np.asarray(ftt.dht(x))
    X = np.fft.fft(x.astype(np.float64))
    want = X.real - X.imag  # DHT = Re(F) - Im(F)
    rt = np.asarray(ftt.idht(H))
    assert rel_l2(rt, x) < 1e-4
    return H, want, 2e-4


def _case_stft_istft_roundtrip(rng):
    n = int(rng.integers(512, 1024))
    x = _arr(rng, (n,))
    n_fft = int(rng.choice([64, 128]))
    hop = n_fft // int(rng.choice([2, 4]))
    win = np.hanning(n_fft).astype(np.float32)
    S = ftt.stft(x, n_fft, hop_length=hop, window=win)
    y = ftt.istft(S, n_fft, hop_length=hop, window=win, length=n)
    return np.asarray(y), x, 1e-4


_CASES.update({
    "periodogram": _case_periodogram,
    "coherence": _case_coherence,
    "decimate": _case_decimate,
    "savgol_filter": _case_savgol,
    "wiener": _case_wiener,
    "cepstrum": _case_cepstrum,
    "fftshift": _case_fftshift,
    "dht_roundtrip": _case_dht,
    "stft_istft_roundtrip": _case_stft_istft_roundtrip,
})

def _case_fft_grad_parseval(rng):
    """AD through the public fft: for L(x) = sum |fft(x)|^2, Parseval
    gives dL/dx = 2 n x exactly — a closed-form gradient oracle."""
    import jax
    import jax.numpy as jnp

    n = int(rng.integers(8, 64))
    x = _arr(rng, (n,))

    def loss(v):
        X = ftt.fft(v)
        return jnp.sum(jnp.real(X) ** 2 + jnp.imag(X) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    return np.asarray(g), 2.0 * n * x, 1e-4


_CASES["fft_grad_parseval"] = _case_fft_grad_parseval


def _case_rfftn(rng):
    x = _arr(rng, _shape(rng, 2, 6, 24))
    kw = {}
    if rng.integers(2):
        kw["axes"] = tuple(int(a) for a in rng.choice(
            2, size=int(rng.integers(1, 3)), replace=False))
    return ftt.rfftn(x, **kw), np.fft.rfftn(x, **kw), 1e-4


def _case_irfftn(rng):
    x = _arr(rng, _shape(rng, 2, 6, 20), cplx=True)
    n_last = int(rng.integers(6, 24))
    return (ftt.irfftn(x, s=(x.shape[0], n_last)),
            np.fft.irfftn(x, s=(x.shape[0], n_last)), 1e-4)


def _case_hfft_ihfft(rng):
    n = int(rng.integers(8, 48))
    if rng.integers(2):
        x = _arr(rng, (n,), cplx=True)
        return ftt.hfft(x), np.fft.hfft(x), 1e-4
    x = _arr(rng, (n,))
    return ftt.ihfft(x), np.fft.ihfft(x), 1e-4


def _case_dstn(rng):
    import scipy.fft as _sf

    x = _arr(rng, _shape(rng, 2))
    typ = int(rng.choice([2, 3]))
    norm = None if rng.integers(2) else "ortho"
    return (ftt.dstn(x, type=typ, norm=norm),
            _sf.dstn(x.astype(np.float64), type=typ, norm=norm), 2e-4)


_CASES.update({
    "rfftn": _case_rfftn,
    "irfftn": _case_irfftn,
    "hfft_ihfft": _case_hfft_ihfft,
    "dstn": _case_dstn,
})



@pytest.mark.parametrize("name", sorted(_CASES))
def test_fuzz_parity(name):
    fn = _CASES[name]
    for rep in range(REPS):
        # zlib.crc32: stable across processes (builtin hash() is salted)
        rng = np.random.default_rng(zlib.crc32(f"{name}:{rep}".encode()))
        got, want, tol = fn(rng)
        err = rel_l2(np.asarray(got), np.asarray(want))
        assert err < tol, (
            f"{name} rep {rep}: rel L2 {err:.3e} >= {tol:.1e}")
