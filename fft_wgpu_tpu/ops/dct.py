"""Discrete cosine / sine transforms (scipy.fft-compatible types II/III).

Built on the C2C pipeline via the even-odd permutation trick, so the hot
loop is the fused Pallas FFT:

    DCT-II:  v[j] = x[2j], v[n-1-j] = x[2j+1];  V = FFT(v)
             X[k] = 2 * Re( exp(-i*pi*k/(2n)) * V[k] )
    DCT-III: inverse of II (with matching norm conventions)
    DST-II/III: via DCT of the sign-flipped, reversed sequence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex_utils import promote_to_split

__all__ = ["dct", "idct", "dst", "idst"]


@functools.lru_cache(maxsize=None)
def _halfshift_np(n: int, sign: int):
    k = np.arange(n, dtype=np.float64)
    theta = sign * np.pi * k / (2.0 * n)
    return np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)


def _even_odd_perm(n: int) -> np.ndarray:
    """v = x[perm]: the evens ascending, then the odds descending."""
    evens = np.arange(0, n, 2)
    odds = np.arange(1, n, 2)[::-1]
    return np.concatenate([evens, odds]).astype(np.int32)


def dct(x, type: int = 2, axis: int = -1, norm=None):
    """DCT along `axis` (types 2 and 3, scipy.fft semantics)."""
    if type == 2:
        return _dct2(x, axis, norm)
    if type == 3:
        return _dct3(x, axis, norm)
    raise NotImplementedError(f"DCT type {type} (supported: 2, 3)")


def idct(x, type: int = 2, axis: int = -1, norm=None):
    """Inverse DCT (scipy semantics: the inverse of `dct(type=...)`)."""
    if type == 2:
        if norm == "ortho":
            return _dct3(x, axis, "ortho")
        return _idct2_core(x, axis)  # backward: exact inverse incl. 1/(2n)
    if type == 3:
        if norm == "ortho":
            return _dct2(x, axis, "ortho")
        y = _dct2(x, axis, None)
        n = jnp.shape(x)[axis]
        return y / jnp.float32(2 * n)
    raise NotImplementedError(f"IDCT type {type} (supported: 2, 3)")


def _dct2(x, axis, norm):
    from ..plan.plan import get_plan

    xr, _ = promote_to_split(x)
    n = xr.shape[axis]
    perm = jnp.asarray(_even_odd_perm(n))
    cr, ci = _halfshift_np(n, -1)
    cr = jnp.asarray(cr)
    ci = jnp.asarray(ci)
    p = get_plan(n, "auto")

    def impl(v):
        v = jnp.moveaxis(v, axis, -1)
        w = jnp.take(v, perm, axis=-1)
        Vr, Vi = p._execute_split(w, jnp.zeros_like(w), -1, None)
        X = 2.0 * (Vr * cr - Vi * ci)  # 2*Re(e^{-i pi k/2n} V[k])
        if norm == "ortho":
            sc = np.full(n, 1.0 / np.sqrt(2.0 * n), np.float32)
            sc[0] = 1.0 / np.sqrt(4.0 * n)
            X = X * jnp.asarray(sc)
        return jnp.moveaxis(X, -1, axis)

    return jax.jit(impl)(xr)


def _idct2_core(x, axis):
    """Backward-norm inverse of DCT-II:
    invperm(Re(IFFT( 0.5 * e^{+i pi k/2n} * (Y - i*Yrev) )))."""
    from ..plan.plan import get_plan

    Yr, _ = promote_to_split(x)
    n = Yr.shape[axis]
    cr, ci = _halfshift_np(n, +1)  # e^{+i pi k / 2n}
    cr = jnp.asarray(cr)
    ci = jnp.asarray(ci)
    inv_perm = jnp.asarray(np.argsort(_even_odd_perm(n)).astype(np.int32))
    p = get_plan(n, "auto")

    def impl(Y):
        Y = jnp.moveaxis(Y, axis, -1)
        Yt = jnp.concatenate(
            [jnp.zeros_like(Y[..., :1]), jnp.flip(Y[..., 1:], axis=-1)],
            axis=-1,
        )
        # 0.5*(Y - i*Yt)*(cr + i*ci)
        Vr = 0.5 * (Y * cr + Yt * ci)
        Vi = 0.5 * (Y * ci - Yt * cr)
        vr, _ = p._execute_split(Vr, Vi, +1, 1.0 / n)
        out = jnp.take(vr, inv_perm, axis=-1)
        return jnp.moveaxis(out, -1, axis)

    return jax.jit(impl)(Yr)


def _dct3(x, axis, norm):
    """DCT-III: backward = 2n * idct2_core; ortho = backward with the input
    pre-scaled by [1/sqrt(n), 1/sqrt(2n), ...]."""
    xr, _ = promote_to_split(x)
    n = xr.shape[axis]
    if norm == "ortho":
        sc = np.full(n, 1.0 / np.sqrt(2.0 * n), np.float32)
        sc[0] = 1.0 / np.sqrt(float(n))
        xr = jnp.moveaxis(jnp.moveaxis(xr, axis, -1) * jnp.asarray(sc), -1, axis)
    y = _idct2_core(xr, axis)
    return y * jnp.float32(2 * n)


def dst(x, type: int = 2, axis: int = -1, norm=None):
    """DST-II/III via the DCT identity
    DST2(x) = reverse( DCT2( (-1)^j * x ) )  and its transpose for type 3.
    (Sign-flip and reversal are orthogonal maps, so norms carry over.)"""
    xr, _ = promote_to_split(x)
    n = xr.shape[axis]
    signs = jnp.asarray(((-1.0) ** np.arange(n)).astype(np.float32))

    if type == 2:
        v = jnp.moveaxis(xr, axis, -1) * signs
        v = jnp.moveaxis(v, -1, axis)
        y = dct(v, type=2, axis=axis, norm=norm)
        return jnp.flip(y, axis=axis)
    if type == 3:
        v = jnp.flip(xr, axis=axis)
        y = dct(v, type=3, axis=axis, norm=norm)
        y = jnp.moveaxis(y, axis, -1) * signs
        return jnp.moveaxis(y, -1, axis)
    raise NotImplementedError(f"DST type {type} (supported: 2, 3)")


def idst(x, type: int = 2, axis: int = -1, norm=None):
    """Inverse DST (scipy semantics)."""
    if type == 2:
        if norm == "ortho":
            return dst(x, type=3, axis=axis, norm="ortho")
        xr, _ = promote_to_split(x)
        n = xr.shape[axis]
        return dst(x, type=3, axis=axis) / jnp.float32(2 * n)
    if type == 3:
        if norm == "ortho":
            return dst(x, type=2, axis=axis, norm="ortho")
        xr, _ = promote_to_split(x)
        n = xr.shape[axis]
        return dst(x, type=2, axis=axis) / jnp.float32(2 * n)
    raise NotImplementedError
