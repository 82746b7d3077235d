"""Real transforms: R2C / C2R (packed even/odd algorithm).

New capability vs the reference (which is C2C only — SURVEY §2); required
by BASELINE.json config 4.  Even lengths use the half-size packing trick
(one complex FFT of length n/2 plus an O(n) recombination), so the R2C
costs ~half the flops and bytes of a full C2C.  Odd lengths fall back to a
zero-imaginary C2C.

All recombination twiddles are f64-generated (core/twiddle.py) and the
whole transform traces into one jitted program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.complex_utils import merge, promote_to_split
from ..core.twiddle import FORWARD, INVERSE, halfcomplex_twiddle_np
from .nd import _norm_axes, fftn_split

__all__ = ["rfft", "irfft", "rfft2", "irfft2", "rfftn", "irfftn", "hfft",
           "ihfft", "hfft2", "ihfft2", "hfftn", "ihfftn"]


def _r2c_general_off() -> bool:
    """Kill switch for the general single-pass R2C routing.

    Round 4 gated this behind a compile-verified allowlist (n=1000/4095
    blew a 900 s remote-compile budget — the tunnel-wedging hazard
    class); the 2026-08-21 toolchain update re-probe cleared it
    (probe_r70: both compile in minutes and run ~2x the composed path),
    so routing is now open with this env escape hatch should a future
    toolchain regress.

    Read at TRACE time: set it before the process (or at least before
    the first transform) — already-compiled executables (plan layer and
    the convenience jit cache alike) keep the routing they were traced
    with.  The public `rfft` key includes the flag so the top entry
    point honors a mid-process toggle."""
    import os

    return os.environ.get("FFT_WGPU_TPU_R2C_GENERAL_OFF") == "1"


def _scales(n, norm, inverse):
    if norm in (None, "backward"):
        return None if not inverse else 1.0 / n
    if norm == "ortho":
        return n**-0.5
    if norm == "forward":
        return 1.0 / n if not inverse else None
    raise ValueError(f"invalid norm {norm!r}")


def rfft_last_split(xr, sign_scale, *, pad_out=False):
    """R2C over the last axis, split output — picks the fastest path.

    On TPU, power-of-two rows in the fused envelope run the single-pass
    Pallas R2C kernel (one HBM round trip; the XLA packed path below pays
    ~5 passes of de-interleave/flip/unpack relayouts, measured 9.7% of
    the R2C roofline).  Everything else uses the packed half-size path.

    pad_out=True returns the PADDED serving form [..., pad_bins(n)]
    (exact zeros past bin n//2) — on the Pallas path this is FASTER than
    the numpy-parity shape (the ragged n/2+1 minor misaligns every HBM
    row: 4096x4096 0.657 vs 0.452 ms, probe_r45); round-trip pipelines
    keep it end-to-end and slice only at the public boundary.
    """
    import jax as _jax

    if _jax.default_backend() == "tpu":
        try:
            from . import pallas_fft
        except ImportError:
            pallas_fft = None
        if pallas_fft is not None:
            try:
                return pallas_fft.rfft_rows_split(xr, sign_scale,
                                                  pad_out=pad_out)
            except pallas_fft.Unsupported:
                pass
            # Composite non-pow2 n: the single-pass general R2C kernel.
            # Round 4 held this back because n=1000/4095 blew a 900 s
            # compile budget; the toolchain update re-probe (probe_r70,
            # 2026-08-21) compiles them in 47/131 s and runs 0.080 /
            # 0.295 ms x1024 rows (rel ~2e-7) — ~2x the composed pack
            # path.  _rfft_gen_core's envelope gates shapes; kill
            # switch: FFT_WGPU_TPU_R2C_GENERAL_OFF=1.
            if not _r2c_general_off():
                try:
                    return pallas_fft.rfft_rows_general_split(
                        xr, sign_scale, pad_out=pad_out)
                except pallas_fft.Unsupported:
                    pass
    Xr, Xi = _rfft_even_split(xr, sign_scale)
    if pad_out:
        from .pallas_fft import pad_bins

        extra = pad_bins(xr.shape[-1]) - Xr.shape[-1]
        pad = [(0, 0)] * (Xr.ndim - 1) + [(0, extra)]
        Xr, Xi = jnp.pad(Xr, pad), jnp.pad(Xi, pad)
    return Xr, Xi


def _rfft_even_split(xr, sign_scale):
    """R2C over the last axis (even n) via half-size packing.

    x real [..., n] -> X split pair [..., n//2 + 1].
    """
    from ..plan.plan import get_plan

    n = xr.shape[-1]
    m = n // 2
    z = xr.reshape(*xr.shape[:-1], m, 2)
    zr, zi = z[..., 0], z[..., 1]
    p = get_plan(m, "auto")
    Zr, Zi = p._execute_split(zr, zi, FORWARD, None)

    # Zfull[k] for k = 0..m (Z[m] == Z[0]); Zrev[k] = Z[(m-k) % m]
    Zr_f = jnp.concatenate([Zr, Zr[..., :1]], axis=-1)
    Zi_f = jnp.concatenate([Zi, Zi[..., :1]], axis=-1)
    Zr_rev = jnp.flip(Zr_f, axis=-1)
    Zi_rev = jnp.flip(Zi_f, axis=-1)

    tr, ti = halfcomplex_twiddle_np(n, FORWARD)  # e^{-2pi i k/n}, k=0..m
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)

    # X[k] = (Z[k] + conj(Zrev[k]))/2 - (i/2) t[k] (Z[k] - conj(Zrev[k]))
    er = 0.5 * (Zr_f + Zr_rev)
    ei = 0.5 * (Zi_f - Zi_rev)
    dr = 0.5 * (Zr_f - Zr_rev)
    di = 0.5 * (Zi_f + Zi_rev)
    # -i * t * d  where t = tr + i ti, d = dr + i di:
    # t*d = (tr*dr - ti*di) + i(tr*di + ti*dr);  -i*(a+ib) = b - ia
    odr = tr * di + ti * dr
    odi = -(tr * dr - ti * di)
    Xr = er + odr
    Xi = ei + odi
    if sign_scale is not None:
        s = jnp.float32(sign_scale)
        Xr, Xi = Xr * s, Xi * s
    return Xr, Xi


def irfft_last_split(Xr, Xi, n, total_scale, *, padded_in=False):
    """C2R over the last axis with explicit TOTAL output scale
    (numpy backward norm == 1/n) — picks the fastest path.

    On TPU, in-envelope power-of-two n runs the single-pass flip-free
    Pallas C2R kernel; otherwise the packed half-size XLA path.

    padded_in=True consumes the padded serving form [..., pad_bins(n)]
    directly (skipping the input pad pass: C2R 4096 0.678 -> 0.436 ms,
    probe_r45); pad columns must be zero (the Pallas kernel self-masks,
    the XLA fallback slices)."""
    import jax as _jax

    T = 1.0 if total_scale is None else float(total_scale)
    if _jax.default_backend() == "tpu":
        try:
            from . import pallas_fft
        except ImportError:
            pallas_fft = None
        if pallas_fft is not None:
            try:
                return pallas_fft.irfft_rows_split(Xr, Xi, n, T,
                                                   padded_in=padded_in)
            except pallas_fft.Unsupported:
                pass
    if padded_in:  # fallback consumes the numpy-parity shape
        Xr = Xr[..., : n // 2 + 1]
        Xi = Xi[..., : n // 2 + 1]
    # packed path applies 1/n internally; pass the remainder on top
    net = T * n
    return _irfft_even_split(Xr, Xi, n,
                             None if abs(net - 1.0) < 1e-12 else net)


def _irfft_even_split(Xr, Xi, n, scale):
    """C2R over the last axis (even n): X [..., n//2+1] -> real [..., n].

    `scale` multiplies the result; numpy's irfft backward norm (1/n) is the
    1/m of the packed inverse FFT plus the factor absorbed in recombination.
    """
    from ..plan.plan import get_plan

    m = n // 2
    # C2R semantics (numpy parity): DC and Nyquist bins are treated as real —
    # their imaginary parts are discarded.
    Xi = Xi.at[..., 0].set(0.0).at[..., m].set(0.0)
    Xr_rev = jnp.flip(Xr, axis=-1)  # X[m-k], k=0..m
    Xi_rev = jnp.flip(Xi, axis=-1)

    tr, ti = halfcomplex_twiddle_np(n, INVERSE)  # e^{+2pi i k/n}
    tr = jnp.asarray(tr[:m])
    ti = jnp.asarray(ti[:m])

    # E[k] = (X[k] + conj(X[m-k]))/2 ; O[k] = (X[k] - conj(X[m-k]))/2 * t[k]
    er = 0.5 * (Xr + Xr_rev)[..., :m]
    ei = 0.5 * (Xi - Xi_rev)[..., :m]
    dr = 0.5 * (Xr - Xr_rev)[..., :m]
    di = 0.5 * (Xi + Xi_rev)[..., :m]
    or_ = tr * dr - ti * di
    oi_ = tr * di + ti * dr
    # Z[k] = E[k] + i O[k]
    Zr = er - oi_
    Zi = ei + or_
    p = get_plan(m, "auto")
    zr, zi = p._execute_split(Zr, Zi, INVERSE, 1.0 / m)
    x = jnp.stack([zr, zi], axis=-1).reshape(*zr.shape[:-1], n)
    if scale is not None:
        x = x * jnp.float32(scale)
    return x


def irfft_prod_last_split(Ar, Ai, Br, Bi, n, total_scale, *,
                          padded_in=False):
    """real(IRFFT(A .* B)) over the last axis — the spectrum-domain
    convolution epilogue.  On TPU the product rides the fused
    product-C2R kernel (one HBM multiply pass saved); elsewhere, and
    for gradients, the composed product + irfft_last_split runs (the
    custom_vjp backward differentiates the composed form, which is
    numerically equivalent)."""

    def composed(ar, ai, br, bi):
        pr = ar * br - ai * bi
        pi = ar * bi + ai * br
        return irfft_last_split(pr, pi, n, total_scale,
                                padded_in=padded_in)

    import jax as _jax

    if _jax.default_backend() != "tpu":
        return composed(Ar, Ai, Br, Bi)
    try:
        from . import pallas_fft
    except ImportError:
        return composed(Ar, Ai, Br, Bi)

    T = 1.0 if total_scale is None else float(total_scale)

    @_jax.custom_vjp
    def fused(ar, ai, br, bi):
        return pallas_fft.irfft_prod_rows_split(ar, ai, br, bi, n, T,
                                                padded_in=padded_in)

    def fwd(ar, ai, br, bi):
        return fused(ar, ai, br, bi), (ar, ai, br, bi)

    def bwd(res, g):
        _, vjp = _jax.vjp(composed, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    try:
        return fused(Ar, Ai, Br, Bi)
    except pallas_fft.Unsupported:
        return composed(Ar, Ai, Br, Bi)


def rfft(x, n=None, axis: int = -1, norm=None):
    """1-D R2C FFT: real input -> n//2+1 complex bins (numpy.fft.rfft)."""
    xr = jnp.asarray(x)
    if jnp.iscomplexobj(xr):
        raise TypeError("rfft requires real input; use fft for complex")
    xr = xr.astype(jnp.float32)
    if n is not None and xr.shape[axis] != n:
        xr = _resize_axis(xr, n, axis)
    length = xr.shape[axis]
    scale = _scales(length, norm, inverse=False)

    def impl(v):
        moved = axis not in (-1, v.ndim - 1)
        if moved:
            v = jnp.moveaxis(v, axis, -1)
        if length % 2 == 0 and length >= 2:
            Xr, Xi = rfft_last_split(v, scale)
        else:
            # odd length: the single-pass general R2C kernel where it
            # applies (composite — ~2x the zero-imag C2C fallback:
            # 1005x1024 0.085 ms vcheck_r66, 4095x1024 0.295 ms
            # probe_r70).  The round-4 compile-budget allowlist is
            # retired: the toolchain update cleared the hazard class
            # (see _r2c_general_off).
            Xr = Xi = None
            import jax as _jax

            if (_jax.default_backend() == "tpu"
                    and not _r2c_general_off()):
                try:  # guarded import first: ImportError during the
                    from .pallas_fft import (Unsupported,  # name binding
                                             rfft_rows_general_split)
                except ImportError:
                    Unsupported = rfft_rows_general_split = None
                if rfft_rows_general_split is not None:
                    try:
                        Xr, Xi = rfft_rows_general_split(v, scale)
                    except Unsupported:
                        Xr = Xi = None
            if Xr is None:  # zero-imag C2C, slice half spectrum
                re, im = fftn_split(v, jnp.zeros_like(v),
                                    (v.ndim - 1,), FORWARD, scale)
                Xr = re[..., : length // 2 + 1]
                Xi = im[..., : length // 2 + 1]
        if moved:
            Xr = jnp.moveaxis(Xr, -1, axis)
            Xi = jnp.moveaxis(Xi, -1, axis)
        return merge(Xr, Xi)

    from ..utils.jit_cache import cached_call, shape_key

    key = ("rfft", jax.default_backend(), shape_key(xr), length, axis,
           scale, _r2c_general_off())
    return cached_call(key, impl, xr)


def irfft(x, n=None, axis: int = -1, norm=None):
    """1-D C2R inverse: n//2+1 bins -> real length-n signal (numpy.fft.irfft)."""
    Xr, Xi = promote_to_split(x)
    length = n if n is not None else 2 * (Xr.shape[axis] - 1)
    bins = length // 2 + 1
    if Xr.shape[axis] != bins:
        Xr = _resize_axis(Xr, bins, axis)
        Xi = _resize_axis(Xi, bins, axis)
    norm_scale = _scales(length, norm, inverse=True)

    def impl(r, i):
        moved = axis not in (-1, r.ndim - 1)
        if moved:
            r = jnp.moveaxis(r, axis, -1)
            i = jnp.moveaxis(i, axis, -1)
        if length % 2 == 0 and length >= 2:
            out = irfft_last_split(r, i, length, norm_scale)
        else:
            fr = _hermitian_extend(r, i, length)
            re, im = fftn_split(fr[0], fr[1], (fr[0].ndim - 1,), INVERSE, norm_scale)
            out = re
        if moved:
            out = jnp.moveaxis(out, -1, axis)
        return out

    from ..utils.jit_cache import cached_call, shape_key

    key = ("irfft", jax.default_backend(), shape_key(Xr), length, axis,
           norm_scale)
    return cached_call(key, impl, Xr, Xi)


def _hermitian_extend(Xr, Xi, n):
    """[..., n//2+1] half spectrum -> full [..., n] hermitian spectrum."""
    k = n // 2 + 1
    tail_r = jnp.flip(Xr[..., 1 : n - k + 1], axis=-1)
    tail_i = -jnp.flip(Xi[..., 1 : n - k + 1], axis=-1)
    return (
        jnp.concatenate([Xr, tail_r], axis=-1),
        jnp.concatenate([Xi, tail_i], axis=-1),
    )


def _resize_axis(a, size, axis):
    cur = a.shape[axis]
    if cur > size:
        idx = [slice(None)] * a.ndim
        idx[axis] = slice(0, size)
        return a[tuple(idx)]
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, size - cur)
    return jnp.pad(a, pad)


def rfftn(x, s=None, axes=None, norm=None):
    """N-D R2C: rfft over the last transform axis, C2C over the rest."""
    xr = jnp.asarray(x).astype(jnp.float32)
    s_, axes_ = _norm_axes(xr.ndim, s, axes)
    last = axes_[-1]
    y = rfft(xr, n=s_[-1], axis=last, norm=norm)
    rest = axes_[:-1]
    if rest:
        from .nd import _run_nd

        y = _run_nd(y, [sz for sz in s_[:-1]], rest, FORWARD, norm, "auto")
    return y


def irfftn(x, s=None, axes=None, norm=None):
    """N-D C2R: inverse C2C over the leading axes, irfft over the last."""
    Xr, Xi = promote_to_split(x)
    z = merge(Xr, Xi)
    s_, axes_ = _norm_axes(Xr.ndim, s, axes)
    rest = axes_[:-1]
    if rest:
        from .nd import _run_nd

        z = _run_nd(z, [sz for sz in s_[:-1]], rest, INVERSE, norm, "auto")
    n_last = s_[-1] if s_[-1] is not None else 2 * (Xr.shape[axes_[-1]] - 1)
    return irfft(z, n=n_last, axis=axes_[-1], norm=norm)


def rfft2(x, s=None, axes=(-2, -1), norm=None):
    return rfftn(x, s=s, axes=list(axes), norm=norm)


def irfft2(x, s=None, axes=(-2, -1), norm=None):
    return irfftn(x, s=s, axes=list(axes), norm=norm)


def hfft(x, n=None, axis: int = -1, norm=None):
    """FFT of a signal with Hermitian symmetry -> real output
    (numpy.fft.hfft semantics): hfft(x, n) == irfft(conj(x), n) * n."""
    Xr, Xi = promote_to_split(x)
    length = n if n is not None else 2 * (Xr.shape[axis] - 1)
    y = irfft(merge(Xr, -Xi), n=length, axis=axis, norm=None)
    if norm in (None, "backward"):
        return y * jnp.float32(length)
    if norm == "ortho":
        return y * jnp.float32(length**0.5)
    if norm == "forward":
        return y
    raise ValueError(f"invalid norm {norm!r}")


def ihfft(x, n=None, axis: int = -1, norm=None):
    """Inverse of hfft: real input -> half-spectrum with conjugate flip."""
    X = rfft(x, n=n, axis=axis, norm=None)
    length = n if n is not None else jnp.shape(x)[axis]
    Xr, Xi = promote_to_split(X)
    if norm in (None, "backward"):
        s = 1.0 / length
    elif norm == "ortho":
        s = length**-0.5
    elif norm == "forward":
        s = 1.0
    else:
        raise ValueError(f"invalid norm {norm!r}")
    return merge(Xr * jnp.float32(s), -Xi * jnp.float32(s))


# Hermitian N-D transforms (scipy.fft.hfftn/ihfftn): symmetry lives on the
# LAST transform axis only; the rest are ordinary C2C passes.  The whole
# family reduces to the real transforms through the conjugation identity
# hfftn(x, norm) == irfftn(conj(x), norm'), ihfftn(x, norm) ==
# conj(rfftn(x, norm')) with backward <-> forward swapped (the Hermitian
# transforms are normalized as FORWARD transforms while c2r/r2c inverses
# are normalized as inverses).
_NORM_SWAP = {None: "forward", "backward": "forward",
              "forward": "backward", "ortho": "ortho"}


def hfftn(x, s=None, axes=None, norm=None):
    """N-D FFT of a signal Hermitian-symmetric in its last transform axis
    (real spectrum), real output — scipy.fft.hfftn semantics."""
    if norm not in _NORM_SWAP:
        raise ValueError(f"invalid norm {norm!r}")
    Xr, Xi = promote_to_split(x)
    return irfftn(merge(Xr, -Xi), s=s, axes=axes, norm=_NORM_SWAP[norm])


def ihfftn(x, s=None, axes=None, norm=None):
    """Inverse of hfftn: real input -> half-spectrum, conjugate-flipped
    (scipy.fft.ihfftn semantics)."""
    if norm not in _NORM_SWAP:
        raise ValueError(f"invalid norm {norm!r}")
    X = rfftn(x, s=s, axes=axes, norm=_NORM_SWAP[norm])
    Xr, Xi = promote_to_split(X)
    return merge(Xr, -Xi)


def hfft2(x, s=None, axes=(-2, -1), norm=None):
    return hfftn(x, s=s, axes=None if axes is None else list(axes), norm=norm)


def ihfft2(x, s=None, axes=(-2, -1), norm=None):
    return ihfftn(x, s=s, axes=None if axes is None else list(axes), norm=norm)
