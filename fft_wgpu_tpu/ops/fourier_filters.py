"""scipy.ndimage-parity Fourier-domain filters.

Multiplicative filters applied to an already-transformed array
(scipy.ndimage.fourier_* semantics): `input` holds the FFT of an image;
`n=-1` means a full complex FFT along `axis`, `n>=0` the R2C half
spectrum of a length-n signal on `axis`.  Multipliers are built on the
host in f64 and applied by ONE module-level jitted multiply (no per-call
retraces — the multiplier is an argument, not a closure constant).

The reference has no image-processing layer (SURVEY §2); together with
ops/structured.py's BCCB solve this covers the classic FFT image
pipeline (blur / shift / deblur).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex_utils import merge, promote_to_split

__all__ = ["fourier_shift", "fourier_gaussian", "fourier_uniform",
           "fourier_ellipsoid"]


@jax.jit
def _mul_real(xr, xi, m):
    return xr * m, xi * m


@jax.jit
def _mul_complex(xr, xi, cr, ci):
    return xr * cr - xi * ci, xr * ci + xi * cr


def _freqs(shape, n, axis):
    """Per-axis frequency grids (cycles/sample, f64): fftfreq everywhere,
    rfft bins on `axis` when n >= 0 (scipy conventions)."""
    rank = len(shape)
    axis = axis % rank
    out = []
    for ax in range(rank):
        m = shape[ax]
        if n >= 0 and ax == axis:
            f = np.arange(m, dtype=np.float64) / n
        else:
            f = np.fft.fftfreq(m)
        out.append(f)
    return out


def _norm_sizes(val, rank, what):
    arr = np.asarray(val, np.float64)
    if arr.ndim == 0:
        arr = np.full(rank, float(arr))
    if arr.shape != (rank,):
        raise ValueError(f"{what} must be a scalar or length-{rank}")
    return arr


def _separable(shape, per_axis_vals):
    mult = np.ones(shape, np.float64)
    for ax, vals in enumerate(per_axis_vals):
        sh = [1] * len(shape)
        sh[ax] = len(vals)
        mult = mult * vals.reshape(sh)
    return mult


def fourier_gaussian(input, sigma, n: int = -1, axis: int = -1):
    """Multiply the transform by a Gaussian kernel's transform
    (scipy.ndimage.fourier_gaussian parity)."""
    xr, xi = promote_to_split(input)
    sig = _norm_sizes(sigma, xr.ndim, "sigma")
    vals = [np.exp(-2.0 * (np.pi * s * f) ** 2)
            for s, f in zip(sig, _freqs(xr.shape, n, axis))]
    m = jnp.asarray(_separable(xr.shape, vals).astype(np.float32))
    return merge(*_mul_real(xr, xi, m))


def fourier_uniform(input, size, n: int = -1, axis: int = -1):
    """Multiply the transform by a uniform (box) kernel's transform
    (scipy.ndimage.fourier_uniform parity)."""
    xr, xi = promote_to_split(input)
    sizes = _norm_sizes(size, xr.ndim, "size")
    vals = [np.sinc(s * f)
            for s, f in zip(sizes, _freqs(xr.shape, n, axis))]
    m = jnp.asarray(_separable(xr.shape, vals).astype(np.float32))
    return merge(*_mul_real(xr, xi, m))


def fourier_shift(input, shift, n: int = -1, axis: int = -1):
    """Multiply the transform by the phase ramp of a real-space shift
    (scipy.ndimage.fourier_shift parity)."""
    xr, xi = promote_to_split(input)
    sh = _norm_sizes(shift, xr.ndim, "shift")
    ph = np.zeros(xr.shape, np.float64)
    for ax, (s, f) in enumerate(zip(sh, _freqs(xr.shape, n, axis))):
        shp = [1] * xr.ndim
        shp[ax] = len(f)
        ph = ph + (-2.0 * np.pi * s * f).reshape(shp)
    cr = jnp.asarray(np.cos(ph).astype(np.float32))
    ci = jnp.asarray(np.sin(ph).astype(np.float32))
    return merge(*_mul_complex(xr, xi, cr, ci))


def fourier_ellipsoid(input, size, n: int = -1, axis: int = -1):
    """Multiply the transform by an ellipsoid kernel's transform
    (scipy.ndimage.fourier_ellipsoid parity; 1-D box, 2-D disk via the
    jinc, 3-D sphere — scipy supports rank <= 3)."""
    xr, xi = promote_to_split(input)
    rank = xr.ndim
    if rank > 3:
        raise ValueError("fourier_ellipsoid supports rank <= 3 (scipy)")
    sizes = _norm_sizes(size, rank, "size")
    r2 = np.zeros(xr.shape, np.float64)
    for ax, (s, f) in enumerate(zip(sizes, _freqs(xr.shape, n, axis))):
        shp = [1] * rank
        shp[ax] = len(f)
        r2 = r2 + ((s * f) ** 2).reshape(shp)
    arg = np.pi * np.sqrt(r2)
    safe = np.maximum(arg, 1e-300)
    with np.errstate(invalid="ignore", divide="ignore"):
        if rank == 1:
            mult = np.where(arg == 0, 1.0, np.sin(safe) / safe)
        elif rank == 2:
            from scipy.special import j1

            mult = np.where(arg == 0, 1.0, 2.0 * j1(safe) / safe)
        else:
            mult = np.where(
                arg == 0, 1.0,
                3.0 * (np.sin(safe) / safe ** 3 - np.cos(safe) / safe ** 2))
    m = jnp.asarray(mult.astype(np.float32))
    return merge(*_mul_real(xr, xi, m))
