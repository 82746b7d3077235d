"""2-D convolution/correlation with boundary handling, polynomial
deconvolution, Wiener filtering, and Savitzky-Golay smoothing.

scipy.signal parity layer (convolve2d / correlate2d / deconvolve / wiener /
savgol_coeffs / savgol_filter / morlet).  The reference (fft_wgpu) has no
convolution layer at all — these ride the framework's FFT kernels
(`helpers.fftconvolve`) the way cuFFT-based stacks ride cufftExecC2C, so the
hot path is the same fused Pallas transform pipeline benchmarked in
BENCHMARKS.md.  Filter/window DESIGN (savgol_coeffs, morlet, edge-fit
matrices) is host-side f64, matching the framework's trig-table rule
(CLAUDE.md): device work is one jitted program per geometry.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .helpers import _as_host_or_device, _iscomplex, fftconvolve

__all__ = [
    "convolve2d",
    "correlate2d",
    "deconvolve",
    "wiener",
    "savgol_coeffs",
    "savgol_filter",
    "morlet",
]


def _pad2d(x, p1: int, p2: int, boundary: str, fillvalue):
    """Pad the two trailing-2 dims by (p1, p2) per side with scipy
    convolve2d's boundary semantics ('fill' | 'wrap' | 'symm')."""
    pads = ((p1, p1), (p2, p2))
    if boundary == "fill":
        if _iscomplex(x) or _iscomplex(fillvalue):
            re = jnp.pad(jnp.real(x), pads, constant_values=np.real(fillvalue))
            im = jnp.pad(jnp.imag(x), pads, constant_values=np.imag(fillvalue))
            return re, im  # planar: caller merges lazily
        return jnp.pad(x, pads, constant_values=fillvalue), None
    mode = {"wrap": "wrap", "symm": "symmetric"}.get(boundary)
    if mode is None:
        raise ValueError(f"unknown boundary {boundary!r}")
    if _iscomplex(x):
        return (jnp.pad(jnp.real(x), pads, mode=mode),
                jnp.pad(jnp.imag(x), pads, mode=mode))
    return jnp.pad(x, pads, mode=mode), None


def _conv2d_impl(in1, in2, mode: str, boundary: str, fillvalue,
                 corr: bool = False):
    in1 = _as_host_or_device(in1)
    in2 = _as_host_or_device(in2)
    if jnp.ndim(in1) != 2 or jnp.ndim(in2) != 2:
        raise ValueError("convolve2d inputs must both be 2-D")
    n1, n2 = in1.shape
    k1, k2 = in2.shape
    if mode not in ("full", "same", "valid"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "valid" and not (
            (n1 >= k1 and n2 >= k2) or (k1 >= n1 and k2 >= n2)):
        raise ValueError(
            "valid mode needs one input at least as large as the other "
            "in every dimension")

    # correlation's 'same' window sits one sample later than
    # convolution's when a kernel dim is even (scipy convention:
    # offset k//2 vs convolve's (k-1)//2)
    s1 = k1 // 2 if corr else (k1 - 1) // 2
    s2 = k2 // 2 if corr else (k2 - 1) // 2

    if boundary == "fill" and (
            np.real(fillvalue) == 0 and np.imag(fillvalue) == 0):
        if mode != "same" or not corr or (k1 % 2 and k2 % 2):
            return fftconvolve(in1, in2, mode=mode)
        full = fftconvolve(in1, in2, mode="full")
        return full[s1:s1 + n1, s2:s2 + n2]

    # Non-trivial boundary: pad by (k-1) per side (the kernel's full
    # reach), run an ordinary zero-boundary convolution, and crop the
    # window of the padded 'full' result that corresponds to the
    # requested mode on the ORIGINAL signal.  full output sample t of
    # the original appears at t + (k-1) in the padded full output.
    p1, p2 = k1 - 1, k2 - 1
    re, im = _pad2d(in1, p1, p2, boundary, fillvalue)
    padded = re if im is None else re + 1j * im
    full_p = fftconvolve(padded, in2, mode="full")
    r0, c0 = p1, p2                      # original full-output origin
    h, w = n1 + k1 - 1, n2 + k2 - 1      # original full-output extent
    if mode == "same":
        r0, c0 = r0 + s1, c0 + s2
        h, w = n1, n2
    elif mode == "valid":
        r0, c0 = r0 + k1 - 1, c0 + k2 - 1
        h, w = n1 - k1 + 1, n2 - k2 + 1
    return full_p[r0:r0 + h, c0:c0 + w]


def convolve2d(in1, in2, mode: str = "full", boundary: str = "fill",
               fillvalue=0):
    """2-D linear convolution (scipy.signal.convolve2d parity) via the
    framework's FFT pipeline, with 'fill'/'wrap'/'symm' boundaries."""
    return _conv2d_impl(in1, in2, mode, boundary, fillvalue)


def correlate2d(in1, in2, mode: str = "full", boundary: str = "fill",
                fillvalue=0):
    """2-D cross-correlation (scipy.signal.correlate2d parity):
    convolution against the conjugated, axis-reversed template."""
    in2 = _as_host_or_device(in2)
    if jnp.ndim(in2) != 2:
        raise ValueError("correlate2d inputs must both be 2-D")
    flipped = jnp.conj(in2[::-1, ::-1]) if _iscomplex(in2) \
        else in2[::-1, ::-1]
    return _conv2d_impl(in1, flipped, mode, boundary, fillvalue, corr=True)


def deconvolve(signal, divisor):
    """Polynomial long division: signal = convolve(divisor, quotient)
    + remainder (scipy.signal.deconvolve parity).

    Inherently sequential recurrence on tiny 1-D inputs — runs host-side
    in f64 like all design-time math in this framework.
    """
    num = np.atleast_1d(np.asarray(signal))
    den = np.atleast_1d(np.asarray(divisor))
    if num.ndim != 1 or den.ndim != 1:
        raise ValueError("deconvolve inputs must be 1-D")
    if den.size == 0 or den[0] == 0:
        raise ValueError("divisor must have a nonzero leading coefficient")
    L = num.size - den.size + 1
    dt = np.result_type(num.dtype, den.dtype, np.float64)
    if L < 1:
        return np.zeros(0, dtype=dt), num.astype(dt)
    rem = num.astype(dt).copy()
    quot = np.zeros(L, dtype=dt)
    d0 = den.astype(dt)
    for k in range(L):
        q = rem[k] / d0[0]
        quot[k] = q
        rem[k:k + den.size] -= q * d0
    return quot, rem


def wiener(im, mysize=None, noise=None):
    """Adaptive local-statistics Wiener filter (scipy.signal.wiener
    parity).  The local mean / mean-square windows run as FFT
    convolutions on device — at typical image sizes the box kernel's
    FFT cost is the same two fused transform passes as any filtering."""
    im = _as_host_or_device(im)
    nd = jnp.ndim(im)
    if mysize is None:
        mysize = (3,) * nd
    elif np.isscalar(mysize):
        mysize = (int(mysize),) * nd
    mysize = tuple(int(m) for m in mysize)
    if len(mysize) != nd:
        raise ValueError("mysize must match the input rank")
    size = math.prod(mysize)
    box = jnp.ones(mysize, dtype=jnp.float32)
    l_mean = fftconvolve(im, box, mode="same") / size
    l_var = fftconvolve(im * im, box, mode="same") / size - l_mean * l_mean
    l_var = jnp.maximum(l_var, 0.0)
    if noise is None:
        noise = jnp.mean(l_var)
    res = l_mean + (im - l_mean) * (1.0 - noise / jnp.maximum(l_var, noise))
    return jnp.where(l_var < noise, l_mean, res)


def savgol_coeffs(window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, pos=None, use: str = "conv"):
    """Savitzky-Golay FIR coefficients (scipy.signal.savgol_coeffs
    parity), designed host-side in f64 via the Vandermonde pseudo-inverse
    (the framework's design-time-math rule)."""
    if polyorder >= window_length:
        raise ValueError("polyorder must be less than window_length")
    if use not in ("conv", "dot"):
        raise ValueError("use must be 'conv' or 'dot'")
    halflen, rem = divmod(window_length, 2)
    if pos is None:
        if rem == 0:
            pos = halflen - 0.5
        else:
            pos = halflen
    if not (0 <= pos < window_length):
        raise ValueError("pos must be nonnegative and less than "
                         "window_length")
    if deriv > polyorder:
        return np.zeros(window_length)
    # rows of A are powers of (x - pos); solve A^T a = y for the impulse
    x = np.arange(-pos, window_length - pos, dtype=np.float64)
    if use == "conv":
        x = x[::-1]
    order = np.arange(polyorder + 1).reshape(-1, 1)
    A = x ** order
    y = np.zeros(polyorder + 1)
    y[deriv] = math.factorial(deriv) / (delta ** deriv)
    coeffs, _, _, _ = np.linalg.lstsq(A, y, rcond=None)
    return coeffs


def _savgol_edge_fit(window_length: int, polyorder: int, deriv: int,
                     delta: float):
    """[window_length, window_length] f64 matrix E with row i = the
    deriv-th derivative at sample i of the least-squares degree-polyorder
    polynomial fit to a window (scipy's 'interp' edge handling, as one
    host-designed matmul)."""
    t = np.arange(window_length, dtype=np.float64)
    A = t.reshape(-1, 1) ** np.arange(polyorder + 1)
    pinv = np.linalg.pinv(A)  # [polyorder+1, wl]
    # derivative operator on the coefficient vector
    rows = []
    for i in range(window_length):
        basis = np.zeros(polyorder + 1)
        for j in range(deriv, polyorder + 1):
            basis[j] = (math.factorial(j) / math.factorial(j - deriv)
                        * t[i] ** (j - deriv)) / delta ** deriv
        rows.append(basis @ pinv)
    return np.stack(rows)


def savgol_filter(x, window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, axis: int = -1, mode: str = "interp",
                  cval: float = 0.0):
    """Savitzky-Golay smoothing (scipy.signal.savgol_filter parity).

    The FIR pass is an FFT convolution on device; 'interp' edges are the
    scipy polynomial edge fit, applied as one host-designed matrix per
    geometry (edge windows are tiny).
    """
    x = _as_host_or_device(x)
    if _iscomplex(x):
        raise ValueError("savgol_filter expects real input")
    x = jnp.asarray(x, jnp.float32)
    if mode not in ("mirror", "constant", "nearest", "interp", "wrap"):
        raise ValueError(f"unknown mode {mode!r}")
    coeffs = savgol_coeffs(window_length, polyorder, deriv=deriv,
                           delta=delta)
    axis = axis % x.ndim
    xm = jnp.moveaxis(x, axis, -1)
    n = xm.shape[-1]
    halflen = window_length // 2

    if mode == "interp":
        if window_length > n:
            raise ValueError("If mode is 'interp', window_length must be "
                             "less than or equal to the size of x.")
        pads = [(0, 0)] * (xm.ndim - 1) + [(halflen, halflen)]
        ext = jnp.pad(xm, pads)  # zero-extend; edges replaced below
        y = _fir_same(ext, coeffs)[..., halflen:halflen + n]
        E = jnp.asarray(_savgol_edge_fit(window_length, polyorder, deriv,
                                         delta), jnp.float32)
        head = xm[..., :window_length] @ E[:halflen].T
        tail = xm[..., n - window_length:] @ E[window_length - halflen:].T
        y = y.at[..., :halflen].set(head)
        y = y.at[..., n - halflen:].set(tail)
    else:
        pad_mode = {"mirror": "reflect", "constant": "constant",
                    "nearest": "edge", "wrap": "wrap"}[mode]
        pads = [(0, 0)] * (xm.ndim - 1) + [(halflen, halflen)]
        if mode == "constant":
            ext = jnp.pad(xm, pads, constant_values=cval)
        else:
            ext = jnp.pad(xm, pads, mode=pad_mode)
        y = _fir_same(ext, coeffs)[..., halflen:halflen + n]
    return jnp.moveaxis(y, -1, axis)


def _fir_same(x, taps):
    """'same' FIR pass along the last axis via the device FFT pipeline."""
    taps = jnp.asarray(np.asarray(taps, np.float32))
    k = jnp.broadcast_to(taps, x.shape[:-1] + taps.shape) \
        if x.ndim > 1 else taps
    if x.ndim > 1:
        full = fftconvolve(x, k, axes=(-1,))
    else:
        full = fftconvolve(x, taps)
    lo = (taps.shape[-1] - 1) // 2
    return full[..., lo:lo + x.shape[-1]]


def morlet(M: int, w: float = 5.0, s: float = 1.0, complete: bool = True):
    """Classic Morlet wavelet (scipy.signal.morlet parity), host-side f64
    (a design-time window, like every trig table in this framework)."""
    x = np.linspace(-s * 2 * np.pi, s * 2 * np.pi, M)
    out = np.exp(1j * w * x)
    if complete:
        out = out - np.exp(-0.5 * w ** 2)
    return out * np.exp(-0.5 * x ** 2) * np.pi ** -0.25
