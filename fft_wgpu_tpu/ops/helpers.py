"""numpy.fft-compatible helpers: shifts, frequency grids, FFT convolution.

Completeness layer so reference users migrating from any FFT stack find
the full expected surface (SURVEY §7 contract: everything composable
under one jit).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "fftshift",
    "ifftshift",
    "fftfreq",
    "rfftfreq",
    "fft_convolve",
]


def fftshift(x, axes=None):
    """Shift zero-frequency to center (numpy.fft.fftshift)."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [x.shape[a] // 2 for a in axes], axes)


def ifftshift(x, axes=None):
    """Inverse of fftshift."""
    x = jnp.asarray(x)
    if axes is None:
        axes = tuple(range(x.ndim))
    elif isinstance(axes, int):
        axes = (axes,)
    return jnp.roll(x, [-(x.shape[a] // 2) for a in axes], axes)


def fftfreq(n: int, d: float = 1.0, *, dtype=jnp.float32):
    """Sample frequencies for fft output bins (numpy.fft.fftfreq)."""
    k = np.fft.fftfreq(n, d).astype(np.float32)  # host-side, exact semantics
    return jnp.asarray(k, dtype)


def rfftfreq(n: int, d: float = 1.0, *, dtype=jnp.float32):
    """Sample frequencies for rfft output bins (numpy.fft.rfftfreq)."""
    k = np.fft.rfftfreq(n, d).astype(np.float32)
    return jnp.asarray(k, dtype)


def fft_convolve(a, b, mode: str = "full", axis: int = -1):
    """1-D linear convolution via the FFT (scipy.signal.fftconvolve-style).

    Real inputs use the R2C pipeline; power-of-two padded length keeps the
    transform on the fused Pallas path.
    """
    from .rfft import irfft, rfft
    from .transforms import fft, ifft

    a = jnp.asarray(a)
    b = jnp.asarray(b)
    la = a.shape[axis]
    lb = b.shape[axis]
    lfull = la + lb - 1
    nfft = 1 << max(1, math.ceil(math.log2(lfull)))

    if jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        fa = fft(a, n=nfft, axis=axis)
        fb = fft(b, n=nfft, axis=axis)
        full = ifft(fa * fb, axis=axis)
    else:
        fa = rfft(a.astype(jnp.float32), n=nfft, axis=axis)
        fb = rfft(b.astype(jnp.float32), n=nfft, axis=axis)
        full = irfft(fa * fb, n=nfft, axis=axis)

    sl = [slice(None)] * full.ndim
    if mode == "full":
        sl[axis] = slice(0, lfull)
    elif mode == "same":
        start = (lb - 1) // 2
        sl[axis] = slice(start, start + la)
    elif mode == "valid":
        lv = max(la, lb) - min(la, lb) + 1
        start = min(la, lb) - 1
        sl[axis] = slice(start, start + lv)
    else:
        raise ValueError(f"invalid mode {mode!r}")
    return full[tuple(sl)]
