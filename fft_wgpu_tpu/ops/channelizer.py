"""Polyphase filter-bank channelizer (WOLA), the SDR/radio-astronomy
workhorse built on batched FFTs.

Splits a stream into P uniformly spaced frequency channels, each
decimated by P, with far better channel isolation than a plain
windowless STFT: frames of length T = taps*P are weighted by a prototype
lowpass h, folded (summed) into P points, and FFT'd — the classic
weighted-overlap-add (WOLA) structure, equivalent to a polyphase
decimating filter bank.  Everything traces into one jitted program and
the FFT rides the framework's batched kernels.

    channelize(x, P) -> [..., frames, P] complex channel series

Prototype filter: windowed-sinc lowpass with cutoff 1/(2P) (Hamming by
default), unit DC gain per channel.

Oracle (tests/test_channelizer.py): a complex tone at channel-k center
lands in channel k within the filter's passband droop, with stopband
leakage below the prototype's sidelobe level; impulse response of each
channel matches the modulated prototype.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["prototype_lowpass", "channelize"]


def prototype_lowpass(n_ch: int, taps: int = 8, window: str = "hamming"):
    """Windowed-sinc prototype lowpass of length taps*n_ch with cutoff at
    the channel half-width 1/(2 n_ch), normalized to unit DC gain."""
    t = taps * n_ch
    n = np.arange(t, dtype=np.float64) - (t - 1) / 2.0
    h = np.sinc(n / n_ch)
    if window == "hamming":
        w = np.hamming(t)
    elif window == "hann":
        w = np.hanning(t)
    elif window in (None, "boxcar"):
        w = np.ones(t)
    else:
        raise ValueError(f"unknown window {window!r}")
    h = h * w
    return jnp.asarray(h / h.sum(), jnp.float32)


def channelize(x, n_ch: int, *, taps: int = 8, window: str = "hamming",
               proto=None):
    """WOLA channelizer: real or complex x [..., T] -> complex channel
    series [..., F, n_ch] with F = T//n_ch - taps + 1 frames (hop n_ch).

    Channel c of frame m is the input mixed down from center frequency
    c/n_ch (cycles/sample), lowpass-filtered by the prototype, and
    decimated by n_ch."""
    from ..core.complex_utils import merge, promote_to_split

    h = prototype_lowpass(n_ch, taps, window) if proto is None \
        else jnp.asarray(proto, jnp.float32)
    t = int(h.shape[0])
    if t % n_ch:
        raise ValueError("prototype length must be a multiple of n_ch")
    xr, xi = promote_to_split(x)
    total = xr.shape[-1]
    frames = total // n_ch - (t // n_ch) + 1
    if frames < 1:
        raise ValueError(
            f"signal too short: need >= {t} samples, got {total}")
    fr, fi = _wola_impl(xr, xi, h, n_ch)
    return merge(fr, fi)


@partial(jax.jit, static_argnums=(3,))
def _wola_impl(xr, xi, h, n_ch):
    t = int(h.shape[0])
    frames = xr.shape[-1] // n_ch - (t // n_ch) + 1
    idx = (np.arange(frames)[:, None] * n_ch
           + np.arange(t)[None, :])  # [F, T]
    wr = xr[..., idx] * h
    wi = xi[..., idx] * h
    # fold T = taps*n_ch weighted samples into n_ch (polyphase sum)
    lead = wr.shape[:-1]
    wr = wr.reshape(*lead, t // n_ch, n_ch).sum(-2)
    wi = wi.reshape(*lead, t // n_ch, n_ch).sum(-2)
    from .nd import fftn_split

    return fftn_split(wr, wi, (wr.ndim - 1,), -1, None)
