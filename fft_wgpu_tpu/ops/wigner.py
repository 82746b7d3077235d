"""Wigner-Ville distribution (and its windowed/pseudo variant).

The quadratic time-frequency representation (Claasen-Mecklenbraeuker
discrete form)

    W[n, k] = sum_{tau=-L..L} x[n+tau] conj(x[n-tau]) e^{-2 pi i k tau / N}

with L the largest lag keeping both indices in range.  Since the
instantaneous autocorrelation r_n[tau] = x[n+tau] x*[n-tau] is
Hermitian in tau, the symmetric sum equals 2 Re(DFT of the tau >= 0
half) - r_n[0] — evaluated for all N time positions as ONE batched FFT.
Lag tau counts sample PAIRS (lag 2 tau of the signal), so bin k maps to
frequency k/(2N) cycles/sample — the classic WVD half-sample-rate grid,
alias-free for analytic signals.

Construction of the [N, N] autocorrelation is a pure gather (no data-
dependent control flow); the transform rides the batched C2C kernels.
Complements ops/short_time_fft.py (linear TF analysis) and ops/cwt.py
(wavelets) in the framework-completeness superset — the reference has
no analysis layer at all (SURVEY §2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex_utils import promote_to_split

__all__ = ["wigner_ville", "wigner_ville_frequencies"]


def wigner_ville_frequencies(n: int, fs: float = 1.0):
    """Frequency grid of wigner_ville: n bins spaced fs/(2n)."""
    return np.arange(n) * fs / (2.0 * n)


@functools.lru_cache(maxsize=32)
def _wv_impl(n: int, win_key):
    from ..core.twiddle import FORWARD
    from ..ops.nd import fftn_split

    # gather tables (host, trace-time constants)
    t = np.arange(n)
    tau_max = np.minimum(t, n - 1 - t)  # max |lag| per time position
    tau = np.arange(n)
    # symmetric half-lag index pair, clamped outside the valid range
    ip = np.clip(t[:, None] + tau[None, :], 0, n - 1)
    im = np.clip(t[:, None] - tau[None, :], 0, n - 1)
    valid = (tau[None, :] <= tau_max[:, None]).astype(np.float32)

    # lag taper: win_key is a hashable tuple of the user window; its
    # CENTER sample is lag 0 (standard pseudo-WVD convention), so the
    # positive-lag weights are window[m//2 + tau], zero past the edge.
    wlag = None
    if win_key is not None:
        w = np.asarray(win_key, np.float32)
        mid = len(w) // 2
        wl = np.zeros(n, np.float32)
        keep = min(len(w) - mid, n)
        wl[:keep] = w[mid:mid + keep]
        wlag = wl

    @jax.jit
    def impl(xr, xi):
        # r[n, tau] = x[n+tau] * conj(x[n-tau]) for tau in [0, n)
        ar, ai = xr[..., ip], xi[..., ip]
        br, bi = xr[..., im], -xi[..., im]
        rr = (ar * br - ai * bi) * valid
        ri = (ar * bi + ai * br) * valid
        # full lag axis [0..n) holds tau >= 0; negative lags are the
        # conjugate mirror, folded in analytically: the FFT of
        # r[tau] + conj(r[tau]) mirrored equals 2*Re(FFT(r)) - r[0]
        if wlag is not None:
            rr = rr * wlag
            ri = ri * wlag
        Rr, _Ri = fftn_split(rr, ri, (rr.ndim - 1,), FORWARD, None)
        r0 = rr[..., :1]
        return 2.0 * Rr - r0

    return impl


def wigner_ville(x, fs: float = 1.0, window=None):
    """Discrete Wigner-Ville distribution of `x` along the last axis.

    Returns (f, W) with W real of shape [..., n, n]: W[..., t, k] is the
    energy density at time t/fs and frequency f[k] = k*fs/(2n).  For a
    real signal, pass its analytic version (ops.helpers.hilbert) to
    avoid cross-term aliasing.  `window` gives the pseudo-WVD: a
    symmetric lag-domain taper whose CENTER sample weights lag 0 (the
    standard PWVD convention — e.g. `np.hanning(2*L+1)` tapers lags to
    +-L); it may be shorter than n (zero weight beyond its reach).

    Frequency marginal: sum_k W[t, k] = n |x[t]|^2 (tested; a window
    rescales it by window[center]).
    """
    xr, xi = promote_to_split(x)
    n = xr.shape[-1]
    win_key = None
    if window is not None:
        w = np.asarray(window, np.float64)
        if w.ndim != 1 or w.size == 0 or w.size > 2 * n - 1:
            raise ValueError(
                f"window must be 1-D with 1..{2 * n - 1} samples")
        win_key = tuple(float(v) for v in w)
    W = _wv_impl(n, win_key)(xr, xi)
    return wigner_ville_frequencies(n, fs), W