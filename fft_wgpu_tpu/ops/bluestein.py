"""Bluestein (chirp-z) FFT for lengths with large prime factors.

The reference supports powers of two only (stage count = log2(fft_len),
fft_wgpu src/processor.rs:327).  Mixed-radix covers smooth n; this module
covers the rest: any n becomes two power-of-two FFTs of length
m >= 2n-1 via the chirp-z identity

    X[k] = conj(c[k]) * IFFT( FFT(conj(c)*x, m) * FFT(b, m) )[k],
    c[j] = exp(+i*pi*j^2/n),  b[j] = c[j] for |j| < n (wrapped)

with the chirp tables generated in f64 on the host (j^2 mod 2n reduction,
so precision holds at large n).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

__all__ = ["fft_bluestein_split", "BLUESTEIN_MIN"]

# below this, the direct O(n^2) DFT matmul on the MXU is faster and exact
BLUESTEIN_MIN = 512


@functools.lru_cache(maxsize=None)
def _chirp_np(n: int, sign: int):
    """(c_re, c_im, Bf_re, Bf_im, m): chirp c[j]=exp(sign*i*pi*j^2/n) and
    the precomputed FFT of the wrapped conjugate-chirp filter b, length m."""
    m = 1 << int(np.ceil(np.log2(2 * n - 1)))
    j = np.arange(n, dtype=np.int64)
    # j^2 mod 2n keeps the f64 phase argument small at large n
    phase = (np.pi / n) * ((j * j) % (2 * n)).astype(np.float64)
    c = np.cos(phase) + 1j * np.sin(phase)  # exp(+i*pi*j^2/n)
    if sign == -1:
        c = np.conj(c)  # forward chirp is exp(-i*pi*j^2/n)
    b = np.zeros(m, dtype=np.complex128)
    b[:n] = np.conj(c)
    b[m - n + 1:] = np.conj(c)[1:][::-1]
    Bf = np.fft.fft(b)
    return (
        c.real.astype(np.float32),
        c.imag.astype(np.float32),
        Bf.real.astype(np.float32),
        Bf.imag.astype(np.float32),
        m,
    )


def fft_bluestein_split(re, im, sign, scale=None):
    """Chirp-z DFT over the last axis of a split (re, im) pair (any n)."""
    from ..plan.plan import get_plan
    from .stockham import apply_scale

    n = re.shape[-1]
    cr, ci, bfr, bfi, m = _chirp_np(n, sign)

    # TPU fused path (VERDICT r3 item 3): the composed pipeline below is
    # ~6 HBM passes (chirp multiply, pad, FFT, filter multiply, IFFT,
    # post-chirp); the fused kernels cut it to ~2 m-sized passes — chirp
    # multiply + zero-pad ride the forward kernel's load stage, the
    # filter-spectrum multiply rides the inverse kernel's load stage, and
    # the n-slice + post-chirp multiply ride its store stage (with the
    # stage-2 dot cut to the contributing rows).  Reference anchor for
    # the fused-epilogue idea: fft_wgpu src/kernel/ifft.wgsl:65-74;
    # composition-in-one-submission: src/examples/basic_inverse2.rs:85-92.
    import jax

    if jax.default_backend() == "tpu":
        try:  # guarded import first: an ImportError inside the main try
            from . import pallas_fft as _pf  # would make the except
        except ImportError:  # clause's _pf.Unsupported a NameError
            _pf = None
    else:
        _pf = None
    if _pf is not None:
        try:
            n_p = -(-n // 128) * 128  # 128-aligned in/out width
            c_pad = np.zeros((2, n_p), np.float32)
            c_pad[0, :n] = cr
            c_pad[1, :n] = ci
            pad = [(0, 0)] * (re.ndim - 1) + [(0, n_p - n)]
            Ar, Ai = _pf.fft_chirp_forward_split(
                jnp.pad(re, pad), jnp.pad(im, pad),
                c_pad[0], c_pad[1], m, -1)
            sc = (1.0 / m) * (1.0 if scale is None else float(scale))
            yr, yi = _pf.fft_chirp_inverse_split(
                Ar, Ai, bfr, bfi, c_pad[0], c_pad[1], n_p, +1, sc)
            return yr[..., :n], yi[..., :n]
        except _pf.Unsupported:
            pass  # m outside the fused envelope: composed path below
    cr = jnp.asarray(cr)
    ci = jnp.asarray(ci)
    bfr = jnp.asarray(bfr)
    bfi = jnp.asarray(bfi)

    # a = c * x, zero-padded to m
    ar = re * cr - im * ci
    ai = re * ci + im * cr
    pad = [(0, 0)] * (re.ndim - 1) + [(0, m - n)]
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)

    p = get_plan(m, "auto")
    Ar, Ai = p._execute_split(ar, ai, -1, None)
    # pointwise multiply with the filter spectrum
    Pr = Ar * bfr - Ai * bfi
    Pi = Ar * bfi + Ai * bfr
    yr, yi = p._execute_split(Pr, Pi, +1, 1.0 / m)

    yr = yr[..., :n]
    yi = yi[..., :n]
    out_r = yr * cr - yi * ci
    out_i = yr * ci + yi * cr
    return apply_scale(out_r, out_i, scale)
