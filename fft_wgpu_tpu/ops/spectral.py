"""Spectral calculus: derivatives of periodic fields via the FFT.

The standard scientific-computing companions of an FFT framework —
d/dx == multiplication by i*k in Fourier space.  Real fields use the
R2C pipeline (half-spectrum) throughout.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .rfft import irfft, rfft

__all__ = ["spectral_derivative", "spectral_gradient", "spectral_laplacian"]


def _k_last(n: int, length: float):
    """rfft wavenumbers for the last axis."""
    return jnp.asarray(
        (2.0 * np.pi / length) * np.arange(n // 2 + 1, dtype=np.float64)
    ).astype(jnp.float32)


def _k_full(n: int, length: float):
    return jnp.asarray(
        (2.0 * np.pi / length) * np.fft.fftfreq(n).astype(np.float64) * n
    ).astype(jnp.float32)


def spectral_derivative(f, order: int = 1, axis: int = -1, length: float = 2 * math.pi):
    """order-th derivative of a real periodic field along `axis`."""
    f = jnp.asarray(f, jnp.float32)
    n = f.shape[axis]

    def impl(v):
        F = rfft(v, axis=axis)
        k = _k_last(n, length)
        shape = [1] * v.ndim
        shape[axis] = k.shape[0]
        ik = jax.lax.complex(jnp.zeros_like(k), k).reshape(shape)
        return irfft(F * ik**order, n=n, axis=axis)

    return jax.jit(impl)(f)


def spectral_gradient(f, lengths=None):
    """Tuple of first derivatives of a real periodic field along each axis."""
    f = jnp.asarray(f, jnp.float32)
    lengths = lengths or (2 * math.pi,) * f.ndim
    return tuple(
        spectral_derivative(f, order=1, axis=ax, length=lengths[ax])
        for ax in range(f.ndim)
    )


def spectral_laplacian(f, lengths=None):
    """Laplacian of a real periodic field (sum of -|k|^2 in Fourier space,
    done in one rfftn/irfftn round trip)."""
    from .rfft import irfftn, rfftn

    f = jnp.asarray(f, jnp.float32)
    lengths = lengths or (2 * math.pi,) * f.ndim
    shape = f.shape
    ks = [np.asarray(_k_full(n, L)) for n, L in zip(shape[:-1], lengths[:-1])]
    ks.append(np.asarray(_k_last(shape[-1], lengths[-1])))
    grids = np.meshgrid(*ks, indexing="ij")
    ksq = jnp.asarray(sum(g**2 for g in grids).astype(np.float32))

    def impl(v):
        F = rfftn(v)
        return irfftn(F * (-ksq).astype(F.dtype), s=shape)

    return jax.jit(impl)(f)
