"""Signal envelope via frequency-domain band splitting (scipy.signal.envelope
parity, scipy >= 1.16 semantics).

The reference library has no signal-analysis layer (SURVEY §2 — bare
batched FFT); this joins ops/helpers.py's hilbert/resample in the
framework-completeness superset.

Everything is ONE jitted split-domain program per (shape, config)
(CLAUDE.md invariant): all band arithmetic — bin index windows, analytic
doubling, residual masks, unpaired-Nyquist corrections — is static host
numpy folded into constants; the traced body is FFT -> gather/mask ->
inverse FFT.  Complex data never crosses the host<->device boundary
(split re/im internally, complex64 only at the API edge).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.complex_utils import merge, promote_to_split
from ..plan.plan import get_plan
from .helpers import _as_host_or_device, _iscomplex
from .rfft import irfft_last_split, rfft_last_split

__all__ = ["envelope"]


def _band_bins(n: int, start: int, stop: int) -> np.ndarray:
    """Bin indices of the band [start, stop) on an n-point spectrum.

    Equivalent to scipy's two branches (direct slice vs fftshift+slice):
    both reduce to arange(start, stop) mod n."""
    return np.arange(start, stop, dtype=np.int64) % n


def envelope(z, bp_in: tuple = (1, None), *, n_out: int | None = None,
             squared: bool = False, residual: str | None = "lowpass",
             axis: int = -1):
    """Envelope (and band residual) of a real or complex signal.

    scipy.signal.envelope parity: returns ``z_env`` of the input shape
    (with `axis` resampled to `n_out`) when ``residual is None``, else
    the pair stacked along a new leading axis of length 2 (so
    ``z_env, z_res = envelope(...)`` unpacks).  ``bp_in`` selects the
    analysis band in DFT-bin units; ``residual='lowpass'`` keeps only the
    below-band part, ``'all'`` everything outside the band.
    """
    z0 = _as_host_or_device(z)
    is_cplx = _iscomplex(z0)
    if not (-z0.ndim <= axis < z0.ndim):
        raise ValueError(f"invalid axis={axis} for shape {z0.shape}")
    n = z0.shape[axis]
    if n <= 0:
        raise ValueError("z.shape[axis] must be > 0")
    if len(bp_in) != 2 or not all(b is None or isinstance(b, (int, np.integer))
                                  for b in bp_in):
        raise ValueError(f"bp_in={bp_in!r} is not a 2-tuple of int|None")
    if n_out is not None and (not isinstance(n_out, (int, np.integer))
                              or n_out <= 0):
        raise ValueError(f"n_out={n_out!r} is not a positive int or None")
    if residual not in ("lowpass", "all", None):
        raise ValueError(f"residual={residual!r} not in ('lowpass','all',None)")

    nout = int(n_out) if n_out is not None else n
    start = int(bp_in[0]) if bp_in[0] is not None else -(n // 2)
    stop = int(bp_in[1]) if bp_in[1] is not None else (n + 1) // 2
    if not (-(n // 2) <= start < stop <= (n + 1) // 2):
        raise ValueError(f"need -n//2 <= bp_in[0] < bp_in[1] <= (n+1)//2 "
                         f"for n={n}, got {bp_in!r}")

    nb = n // 2 + 1                       # one-sided bin count (real input)
    band = _band_bins(n, start, stop)
    lb = band.size

    # Analytic-signal doubling for real inputs (negative bins are zero, so
    # the band's positive half carries the full amplitude).
    dbl = np.ones(nb, np.float64)
    if start > 0:
        dbl[start:stop] = 2.0
    elif stop > 0:
        dbl[1:stop] = 2.0

    # Residual mask over the n-point spectrum: band removed; lowpass
    # additionally removes everything at-or-above the band.
    mask = np.ones(n, np.float64)
    mask[band] = 0.0
    if residual == "lowpass":
        if stop > 0:
            mask[stop:(n + 1) // 2] = 0.0
        else:
            mask[n + start:] = 0.0
            mask[0:(n + 1) // 2] = 0.0

    m = min(n, nout)                      # resampling: surviving bins
    m2 = m // 2 + 1

    band_c = jnp.asarray(band)
    dbl_c = jnp.asarray(dbl.astype(np.float32))
    mask_c = jnp.asarray(mask.astype(np.float32))
    maskb_c = jnp.asarray(mask[:nb].astype(np.float32))

    p_bb = get_plan(nout)                 # baseband inverse (length n_out)

    def _baseband_env(Zr, Zi):
        """|ifft(Z[band] zero-padded/truncated to n_out)| * (n_out/n)."""
        br = jnp.take(Zr, band_c, axis=-1)
        bi = jnp.take(Zi, band_c, axis=-1)
        if lb >= nout:
            br, bi = br[..., :nout], bi[..., :nout]
        else:
            pad = [(0, 0)] * (br.ndim - 1) + [(0, nout - lb)]
            br, bi = jnp.pad(br, pad), jnp.pad(bi, pad)
        # fak * ifft  ==  (n_out/n) * (1/n_out) * sum  ==  (1/n) * sum
        er, ei = p_bb._execute_split(br, bi, +1, 1.0 / n)
        sq = er * er + ei * ei
        return sq if squared else jnp.sqrt(sq)

    def _resample_c2c_split(Zr, Zi):
        """scipy.signal.resample(Z, n_out, domain='freq') on split data;
        total scale folded to 1/n (ifft's 1/n_out times 1/s_fac)."""
        if nout == n:
            return get_plan(n)._execute_split(Zr, Zi, +1, 1.0 / n)
        sh = Zr.shape[:-1] + (nout,)
        Yr = jnp.zeros(sh, Zr.dtype)
        Yi = jnp.zeros(sh, Zi.dtype)
        Yr = Yr.at[..., :m2].set(Zr[..., :m2])
        Yi = Yi.at[..., :m2].set(Zi[..., :m2])
        if m2 < m:
            Yr = Yr.at[..., m2 - m:].set(Zr[..., m2 - m:])
            Yi = Yi.at[..., m2 - m:].set(Zi[..., m2 - m:])
        if m % 2 == 0:
            if nout < n:      # fold the bin pair into one unpaired bin
                Yr = Yr.at[..., nout - m // 2].add(Zr[..., n - m // 2])
                Yi = Yi.at[..., nout - m // 2].add(Zi[..., n - m // 2])
            else:             # split the unpaired bin into a pair
                Yr = Yr.at[..., m // 2].mul(0.5)
                Yi = Yi.at[..., m // 2].mul(0.5)
                Yr = Yr.at[..., nout - m // 2].set(Yr[..., m // 2])
                Yi = Yi.at[..., nout - m // 2].set(Yi[..., m // 2])
        return p_bb._execute_split(Yr, Yi, +1, 1.0 / n)

    if not is_cplx:
        def impl_real(v):
            v = jnp.moveaxis(v, axis, -1)
            if n % 2 == 0:
                Rr, Ri = rfft_last_split(v, None)        # nb bins
            else:  # packed R2C is even-only: zero-imag C2C, keep half
                Rr, Ri = get_plan(n)._execute_split(
                    v, jnp.zeros_like(v), -1, None)
                Rr, Ri = Rr[..., :nb], Ri[..., :nb]
            Rr, Ri = Rr * dbl_c, Ri * dbl_c
            pad = [(0, 0)] * (Rr.ndim - 1) + [(0, n - nb)]
            env = _baseband_env(jnp.pad(Rr, pad), jnp.pad(Ri, pad))
            env = jnp.moveaxis(env, -1, axis)
            if residual is None:
                return env
            Mr, Mi = Rr * maskb_c, Ri * maskb_c
            if nout != n and m % 2 == 0:
                c = 2.0 if nout < n else 0.5
                Mr = Mr.at[..., m // 2].mul(c)
                Mi = Mi.at[..., m // 2].mul(c)
            kb = nout // 2 + 1
            if kb <= nb:
                Mr, Mi = Mr[..., :kb], Mi[..., :kb]
            else:
                pad2 = [(0, 0)] * (Mr.ndim - 1) + [(0, kb - nb)]
                Mr, Mi = jnp.pad(Mr, pad2), jnp.pad(Mi, pad2)
            # fak * irfft == 1/n total
            if nout % 2 == 0:
                res = irfft_last_split(Mr, Mi, nout, 1.0 / n)
            else:  # packed C2R is even-only: Hermitian-extend + C2C
                Fr = jnp.concatenate([Mr, jnp.flip(Mr[..., 1:kb], -1)], -1)
                Fi = jnp.concatenate([Mi, -jnp.flip(Mi[..., 1:kb], -1)], -1)
                res, _ = p_bb._execute_split(Fr, Fi, +1, 1.0 / n)
            return jnp.stack([env, jnp.moveaxis(res, -1, axis)], axis=0)

        return jax.jit(impl_real)(jnp.asarray(z0, jnp.float32))

    zr, zi = promote_to_split(z0)

    def impl_cplx(vr, vi):
        vr = jnp.moveaxis(vr, axis, -1)
        vi = jnp.moveaxis(vi, axis, -1)
        Zr, Zi = get_plan(n)._execute_split(vr, vi, -1, None)
        env = jnp.moveaxis(_baseband_env(Zr, Zi), -1, axis)
        if residual is None:
            return env, None
        rr, ri = _resample_c2c_split(Zr * mask_c, Zi * mask_c)
        return (env, (jnp.moveaxis(rr, -1, axis), jnp.moveaxis(ri, -1, axis)))

    env, res = jax.jit(impl_cplx)(zr, zi)
    if residual is None:
        return env
    # scipy stacks env (real) with the complex residual -> complex result
    return jnp.stack([merge(env, jnp.zeros_like(env)),
                      merge(res[0], res[1])], axis=0)
