"""Cepstral analysis: real/complex cepstrum and minimum-phase
reconstruction — the homomorphic-deconvolution layer over the FFT stack
(echo detection, pitch tracking, filter design).

    real_cepstrum(x)          irfft(log |rfft(x)|)            real -> real
    complex_cepstrum(x)       ifft(log X) with unwrapped,     real -> (real, ndelay)
                              linear-phase-corrected angle
    inverse_complex_cepstrum  exact inverse of the above
    minimum_phase(h)          homomorphic minimum-phase filter
                              (scipy.signal.minimum_phase parity,
                              Oppenheim & Schafer eq. 13.42b)

All transforms ride the framework's batched split-spectrum kernels
(`ops/rfft.py`, `ops/nd.py`) inside ONE jitted program per shape; inputs
and outputs are real, so nothing complex ever crosses the host<->device
boundary.  The reference has no cepstral layer (it is a bare C2C FFT
library, SURVEY §1); parity targets are MATLAB's rceps/cceps/icceps
conventions and scipy.signal.minimum_phase(method="homomorphic").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.twiddle import FORWARD, INVERSE

__all__ = ["real_cepstrum", "complex_cepstrum", "inverse_complex_cepstrum",
           "minimum_phase"]


def _fft_last(re, im, sign, scale):
    from .nd import fftn_split

    return fftn_split(re, im, (re.ndim - 1,), sign, scale)


def real_cepstrum(x, n: int | None = None, axis: int = -1):
    """Real cepstrum irfft(log |rfft(x)|) along `axis` (MATLAB rceps).

    The log magnitude is floored at 1e-12 * max|X| per row to keep exact
    spectral zeros from producing -inf."""
    x = jnp.asarray(x, jnp.float32)
    x = jnp.moveaxis(x, axis, -1)
    if n is not None:
        x = x[..., :n] if x.shape[-1] >= n \
            else jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])])
    out = _real_cepstrum_impl(x)
    return jnp.moveaxis(out, -1, axis)


@jax.jit
def _real_cepstrum_impl(x):
    n = x.shape[-1]
    re, im = _fft_last(x, jnp.zeros_like(x), FORWARD, None)
    mag = jnp.sqrt(re * re + im * im)
    floor = 1e-12 * jnp.max(mag, axis=-1, keepdims=True)
    logmag = jnp.log(jnp.maximum(mag, floor))
    cr, _ = _fft_last(logmag, jnp.zeros_like(logmag), INVERSE, 1.0 / n)
    return cr


def complex_cepstrum(x, axis: int = -1):
    """Complex cepstrum along `axis` (MATLAB cceps): ifft(log X) using the
    unwrapped phase with its linear component removed.  Returns
    (cepstrum, ndelay) where `ndelay` is the removed circular delay in
    samples — pass both to :func:`inverse_complex_cepstrum` to invert.
    Input must be real with no exact spectral zeros; as with MATLAB's
    cceps/icceps, the roundtrip is exact only when the unwrapped
    corrected phase is truly odd-symmetric (pulse-dominated or
    minimum-phase signals) — the discarded imaginary cepstral residue
    measures the deviation otherwise."""
    x = jnp.asarray(x, jnp.float32)
    x = jnp.moveaxis(x, axis, -1)
    c, nd = _complex_cepstrum_impl(x)
    return jnp.moveaxis(c, -1, axis), nd


@jax.jit
def _complex_cepstrum_impl(x):
    n = x.shape[-1]
    re, im = _fft_last(x, jnp.zeros_like(x), FORWARD, None)
    logmag = 0.5 * jnp.log(re * re + im * im)
    ph = jnp.unwrap(jnp.arctan2(im, re), axis=-1)
    # remove the linear phase (circular delay), MATLAB cceps convention:
    # nd = round(ph[n//2] / pi), ph -= pi * nd * arange(n) / (n//2)
    nd = jnp.round(ph[..., n // 2] / jnp.pi)
    ph = ph - jnp.pi * nd[..., None] * jnp.arange(n, dtype=ph.dtype) / (n // 2)
    cr, _ = _fft_last(logmag, ph, INVERSE, 1.0 / n)
    return cr, nd


def inverse_complex_cepstrum(ceps, ndelay, axis: int = -1):
    """Exact inverse of :func:`complex_cepstrum` (MATLAB icceps)."""
    c = jnp.asarray(ceps, jnp.float32)
    c = jnp.moveaxis(c, axis, -1)
    nd = jnp.asarray(ndelay, jnp.float32)
    out = _icceps_impl(c, nd)
    return jnp.moveaxis(out, -1, axis)


@jax.jit
def _icceps_impl(c, nd):
    n = c.shape[-1]
    Cr, Ci = _fft_last(c, jnp.zeros_like(c), FORWARD, None)
    ph = Ci + jnp.pi * nd[..., None] * jnp.arange(n, dtype=Cr.dtype) / (n // 2)
    mag = jnp.exp(Cr)
    Xr, Xi = mag * jnp.cos(ph), mag * jnp.sin(ph)
    xr, _ = _fft_last(Xr, Xi, INVERSE, 1.0 / n)
    return xr


def minimum_phase(h, method: str = "homomorphic",
                  n_fft: int | None = None, *, half: bool = True):
    """Minimum-phase filter from a linear-phase FIR `h`
    (scipy.signal.minimum_phase parity).

    method='homomorphic': cepstral folding; with `half=True` (default)
    the magnitude response is the square root of the original and
    (len(h)+1)//2 taps are returned; `half=False` keeps the full
    magnitude and length.  method='hilbert' (Damera-Venkata DHT method,
    half-magnitude only) matches scipy's boosted/scaled spectrum form.
    """
    h = jnp.asarray(h, jnp.float32)
    if h.ndim != 1:
        raise ValueError("minimum_phase expects a 1-D filter")
    m = int(h.shape[0])
    if m < 2:
        raise ValueError("filter must have at least 2 taps")
    if method not in ("homomorphic", "hilbert"):
        raise ValueError(
            f"method must be 'homomorphic' or 'hilbert', got {method!r}")
    if method == "hilbert" and not half:
        raise ValueError("half=False is not supported for method='hilbert'")
    if n_fft is None:
        n_fft = 2 ** int(np.ceil(np.log2(2 * (m - 1) / 0.01)))
    n_fft = int(n_fft)
    if n_fft < m:
        raise ValueError(f"n_fft must be >= len(h) == {m}")
    n_half = m // 2
    n_out = (n_half + m % 2) if half else m
    if method == "hilbert":
        out = _minimum_phase_hilbert_impl(h, n_fft, n_half)
        return out[:n_out]
    # homomorphic window 2u[n] - d[n]: double positive quefrencies, zero
    # negative ones (Oppenheim & Schafer 3rd ed eq 13.42b)
    win = np.zeros(n_fft, np.float32)
    win[0] = 1.0
    stop = n_fft // 2
    win[1:stop] = 2.0
    if n_fft % 2:
        win[stop] = 1.0
    out = _minimum_phase_impl(h, jnp.asarray(win), n_fft,
                              0.5 if half else 1.0)
    return out[:n_out]


@partial(jax.jit, static_argnums=(2, 3))
def _minimum_phase_impl(h, win, n_fft, half_scale):
    hp = jnp.pad(h, (0, n_fft - h.shape[0]))
    re, im = _fft_last(hp, jnp.zeros_like(hp), FORWARD, None)
    mag = jnp.sqrt(re * re + im * im)
    # scipy's guard: lift exact zeros to 1e-7 * smallest positive value
    pos_min = jnp.min(jnp.where(mag > 0, mag, jnp.inf))
    logmag = half_scale * jnp.log(mag + 1e-7 * pos_min)
    cep, _ = _fft_last(logmag, jnp.zeros_like(logmag), INVERSE, 1.0 / n_fft)
    cep = cep * win
    Cr, Ci = _fft_last(cep, jnp.zeros_like(cep), FORWARD, None)
    eXr = jnp.exp(Cr) * jnp.cos(Ci)
    eXi = jnp.exp(Cr) * jnp.sin(Ci)
    hr, _ = _fft_last(eXr, eXi, INVERSE, 1.0 / n_fft)
    return hr


@partial(jax.jit, static_argnums=(1, 2))
def _minimum_phase_hilbert_impl(h, n_fft, n_half):
    """Damera-Venkata/Evans/McCaslin discrete-Hilbert-transform method
    (scipy.signal.minimum_phase method='hilbert'): linear-phase shift to
    a real zero-phase response, boost/scale into [0, 1], sqrt, then the
    modified DHT reconstruction exp(H{log|.|})."""
    hp = jnp.pad(h, (0, n_fft - h.shape[0]))
    re, im = _fft_last(hp, jnp.zeros_like(hp), FORWARD, None)
    # undo the linear phase: Re( FFT(h) * e^{+j w n_half} )
    w = (2.0 * np.pi * n_half / n_fft) * np.arange(n_fft)
    cw = jnp.asarray(np.cos(w), jnp.float32)
    sw = jnp.asarray(np.sin(w), jnp.float32)
    H = re * cw - im * sw
    dp = jnp.max(H) - 1.0
    ds = -jnp.min(H)
    S = 4.0 / (jnp.sqrt(1.0 + dp + ds) + jnp.sqrt(1.0 - dp + ds)) ** 2
    mag = jnp.sqrt((H + ds) * S) + 1e-10
    # modified discrete Hilbert transform: -j sign(freq) in quefrency
    sig = np.zeros(n_fft, np.float32)
    sig[1: n_fft // 2] = 1.0
    sig[n_fft // 2 + 1:] = -1.0
    sig = jnp.asarray(sig)
    logm = jnp.log(mag)
    lr, li = _fft_last(logm, jnp.zeros_like(logm), INVERSE, 1.0 / n_fft)
    er, ei = _fft_last(sig * lr, sig * li, FORWARD, None)
    pr = jnp.exp(er) * jnp.cos(ei)
    pi = jnp.exp(er) * jnp.sin(ei)
    hr, _ = _fft_last(mag * pr, mag * pi, INVERSE, 1.0 / n_fft)
    return hr
