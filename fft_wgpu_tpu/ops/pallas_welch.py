"""Fused segment-spectrum kernels: framing + detrend + window + R2C +
|.|^2 + segment-mean in ONE Pallas pass (VERDICT r4 item 7).

The composed welch/spectrogram pipeline over a long signal pays separate
HBM passes for framing (writes the K-times-expanded [num, nperseg]
frame matrix), the window multiply, the R2C, the |.|^2, and the segment
mean.  For the standard hop-divides-nperseg overlap, a frame is K =
nperseg/hop consecutive hop-sized chunks of the signal — so a 128-row
block of frames is a LANE-CONCAT of K shifted sublane slices of a
[chunks, hop] view, built in VMEM from two adjacent 128-chunk blocks.
Total HBM traffic collapses to ~2 reads of the signal plus a [128,
pad_bins] accumulator (welch) or the spectra (spectrogram).

Reference anchor: the fused-epilogue idea of the reference's inverse
kernel (fft_wgpu src/kernel/ifft.wgsl:65-74) applied to the whole
estimator: load-stage = frame+detrend+window, store-stage = power
accumulate.  The reference itself has no spectral-estimation layer
(C2C only — SURVEY §2); scipy.signal.welch/spectrogram define parity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fft import (
    _BALANCED,
    _BALANCED_R2C,
    Unsupported,
    _interp,
    _r2c_bal_vals,
    _rows_bal_vals,
    pad_bins,
)

__all__ = ["welch_accum_split", "csd_accum_split",
           "coherence_accum_split", "spec_psd_split",
           "spec_rfft_split", "welch_accum_c2c_split", "spec_c2c_split",
           "fused_welch_ok"]

_MAX_K = 8  # frames spanning more than 8 hop-chunks: composed path


def fused_welch_ok(t: int, nperseg: int, hop: int, nfft: int,
                   detrend, *, c2c: bool = False) -> bool:
    """Envelope of the fused segment-spectrum kernels (c2c=True checks
    the two-sided complex-input variant's table)."""
    return (
        nfft in (_BALANCED if c2c else _BALANCED_R2C)
        and nfft >= nperseg
        and 0 < hop <= nperseg
        and nperseg % hop == 0
        and nperseg // hop <= _MAX_K
        and t >= nperseg
        # identity checks: `0 in (False, ...)` is True via __eq__, but
        # the composed path's _detrend_seg REJECTS detrend=0 — accepting
        # it here would make behavior backend-dependent (review r5)
        and (detrend is False or detrend is None or detrend == "constant")
    )


def _cut_mask(a, mp, mp_out, bt):
    """Pad/cut pre-transpose rows to mp_out and zero rows >= mp (the k2
    overshoot carries garbage)."""
    if a.shape[0] < mp_out:
        a = jnp.concatenate(
            [a, jnp.zeros((mp_out - a.shape[0], bt), jnp.float32)], axis=0)
    else:
        a = a[:mp_out]
    if mp_out > mp:
        keep = (jax.lax.broadcasted_iota(jnp.int32, (mp_out, bt), 0)
                < mp).astype(jnp.float32)
        a = a * keep
    return a


def _r2c_bal_split(frames, *, n, n1, n2, factors, mp, mp_out):
    """Balanced R2C of [128, n] real frames -> split spectra pair
    [mp_out, 128] PRE-transpose (bins > n/2 zeroed) — the SHARED
    pallas_fft._r2c_bal_vals math (single source of truth) plus the
    cut/zero-mask."""
    bt = frames.shape[0]
    dr, di = _r2c_bal_vals(frames, n=n, n1=n1, n2=n2, sign=-1, scale=1.0,
                           mp=mp, factors=factors)
    return (_cut_mask(dr, mp, mp_out, bt), _cut_mask(di, mp, mp_out, bt))


def _r2c_power(frames, *, n, n1, n2, factors, mp, mp_out):
    """Balanced R2C power |X|^2 of [128, n] real frames -> [128, mp_out]."""
    dr, di = _r2c_bal_split(frames, n=n, n1=n1, n2=n2, factors=factors,
                            mp=mp, mp_out=mp_out)
    return (dr * dr + di * di).T  # [bt, mp_out]


def _c2c_bal_split(fr, fi, *, n, n1, n2, factors):
    """Balanced C2C of [128, n] complex frame pairs -> FULL split spectra
    [n, 128] pre-transpose — the SHARED pallas_fft._rows_bal_vals math
    (single source of truth), the two-sided segment transform."""
    return _rows_bal_vals(fr, fi, n=n, n1=n1, n2=n2, sign=-1, scale=1.0,
                          factors=factors)


def _frames_from_chunks(a, b, w, *, nperseg, hop, K, n, num, detrend_c,
                        block_seg0, roll_s=0):
    """[128, hop] x2 adjacent chunk blocks -> detrended, windowed,
    validity-masked frames [128, n] (zero-padded to nfft=n, then
    lane-rolled left by roll_s — the ShortTimeFFT phase_shift)."""
    comb = jnp.concatenate([a, b], axis=0)  # chunks s0 .. s0+255
    # frame r = chunks r..r+K-1 lane-concatenated.  The obvious
    # comb[k:k+128] slices carry a sublane-OFFSET layout that
    # tpu.concatenate rejects ("result/input offset mismatch on
    # non-concat dimension" — bench_r5b); pltpu.roll materializes each
    # shift back at offset 0, and the [0:128] slice is offset-free.
    def shift(k):
        if k == 0:
            return comb[0:128]
        # roll takes non-negative shifts: rotating forward by 256-k puts
        # row r+k at row r (the [0:128] window never sees the wrap)
        return pltpu.roll(comb, comb.shape[0] - k, 0)[0:128]

    frames = jnp.concatenate([shift(k) for k in range(K)], axis=1)
    # segments past num-1 straddle the zero-padded tail with PARTIAL real
    # content — mask them to exact zero so they contribute no power
    seg = block_seg0 + jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    frames = frames * (seg < num).astype(jnp.float32)
    if detrend_c:
        frames = frames - jnp.mean(frames, axis=1, keepdims=True)
    frames = frames * w[0]
    if n > nperseg:  # nfft zero-pad: a free in-kernel lane concat
        frames = jnp.concatenate(
            [frames, jnp.zeros((128, n - nperseg), jnp.float32)], axis=1)
    if roll_s:  # left-roll by roll_s == forward roll by n - roll_s
        frames = pltpu.roll(frames, n - roll_s, 1)
    return frames


def _kernel_welch_accum(a_ref, b_ref, w_ref, o_ref, *, n, n1, n2, factors,
                        mp, mp_out, nperseg, hop, K, num, detrend_c, flat=False):
    # grid (B, nblocks): batch outer, segment blocks inner (the inner
    # dim iterates fastest, so each batch row's accumulator block is
    # revisited across its full i-sweep before b advances).  flat=True
    # is the B==1 2-D layout (grid (nblocks,), 2-D blocks, ref[:]) —
    # measurably faster than a unit leading dim (PERFORMANCE round-5h).
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    frames = _frames_from_chunks(
        rd(a_ref), rd(b_ref), w_ref[:], nperseg=nperseg, hop=hop, K=K,
        n=n, num=num, detrend_c=detrend_c, block_seg0=i * 128)
    p = _r2c_power(frames, n=n, n1=n1, n2=n2, factors=factors, mp=mp,
                   mp_out=mp_out)
    ix = slice(None) if flat else 0

    @pl.when(i == 0)
    def _init():
        o_ref[ix] = p

    @pl.when(i > 0)
    def _accum():
        o_ref[ix] = o_ref[ix] + p


def _kernel_spec_psd(a_ref, b_ref, w_ref, o_ref, *, n, n1, n2, factors,
                     mp, mp_out, nperseg, hop, K, num, detrend_c, flat=False):
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    frames = _frames_from_chunks(
        rd(a_ref), rd(b_ref), w_ref[:], nperseg=nperseg, hop=hop, K=K,
        n=n, num=num, detrend_c=detrend_c, block_seg0=i * 128)
    o_ref[slice(None) if flat else 0] = _r2c_power(
        frames, n=n, n1=n1, n2=n2, factors=factors, mp=mp, mp_out=mp_out)


def _kernel_spec_split(a_ref, b_ref, w_ref, or_ref, oi_ref, *, n, n1, n2,
                       factors, mp, mp_out, nperseg, hop, K, num,
                       detrend_c, roll_s=0, flat=False):
    """Framed R2C with SPLIT spectra output (the stft/_spec_segments
    building block): frames built in VMEM, spectra written per segment."""
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    frames = _frames_from_chunks(
        rd(a_ref), rd(b_ref), w_ref[:], nperseg=nperseg, hop=hop, K=K,
        n=n, num=num, detrend_c=detrend_c, block_seg0=i * 128,
        roll_s=roll_s)
    dr, di = _r2c_bal_split(frames, n=n, n1=n1, n2=n2, factors=factors,
                            mp=mp, mp_out=mp_out)
    ix = slice(None) if flat else 0
    or_ref[ix] = dr.T
    oi_ref[ix] = di.T


def _kernel_csd_accum(xa_ref, xb_ref, ya_ref, yb_ref, w_ref, or_ref,
                      oi_ref, *, n, n1, n2, factors, mp, mp_out, nperseg,
                      hop, K, num, detrend_c, flat=False):
    """Cross-spectrum accumulator: sum_s conj(X_s) * Y_s (scipy csd
    convention) — both signals framed, transformed and cross-multiplied
    in one pass."""
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    kw = dict(nperseg=nperseg, hop=hop, K=K, n=n, num=num,
              detrend_c=detrend_c, block_seg0=i * 128)
    fx = _frames_from_chunks(rd(xa_ref), rd(xb_ref), w_ref[:], **kw)
    fy = _frames_from_chunks(rd(ya_ref), rd(yb_ref), w_ref[:], **kw)
    mkw = dict(n=n, n1=n1, n2=n2, factors=factors, mp=mp, mp_out=mp_out)
    xr, xi = _r2c_bal_split(fx, **mkw)
    yr, yi = _r2c_bal_split(fy, **mkw)
    pr = (xr * yr + xi * yi).T  # Re(conj(X) Y)
    pi = (xr * yi - xi * yr).T  # Im(conj(X) Y)
    ix = slice(None) if flat else 0

    @pl.when(i == 0)
    def _init():
        or_ref[ix] = pr
        oi_ref[ix] = pi

    @pl.when(i > 0)
    def _accum():
        or_ref[ix] = or_ref[ix] + pr
        oi_ref[ix] = oi_ref[ix] + pi


def _kernel_coh_accum(xa_ref, xb_ref, ya_ref, yb_ref, w_ref, or_ref,
                      oi_ref, xx_ref, yy_ref, *, n, n1, n2, factors, mp,
                      mp_out, nperseg, hop, K, num, detrend_c,
                      flat=False):
    """Coherence accumulator: ONE pass produces conj(X)Y, |X|^2 and
    |Y|^2 sums — coherence() used to pay three full estimator passes
    (csd + welch(x) + welch(y))."""
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    kw = dict(nperseg=nperseg, hop=hop, K=K, n=n, num=num,
              detrend_c=detrend_c, block_seg0=i * 128)
    fx = _frames_from_chunks(rd(xa_ref), rd(xb_ref), w_ref[:], **kw)
    fy = _frames_from_chunks(rd(ya_ref), rd(yb_ref), w_ref[:], **kw)
    mkw = dict(n=n, n1=n1, n2=n2, factors=factors, mp=mp, mp_out=mp_out)
    xr, xi = _r2c_bal_split(fx, **mkw)
    yr, yi = _r2c_bal_split(fy, **mkw)
    pr = (xr * yr + xi * yi).T
    pi = (xr * yi - xi * yr).T
    sxx = (xr * xr + xi * xi).T
    syy = (yr * yr + yi * yi).T
    ix = slice(None) if flat else 0

    @pl.when(i == 0)
    def _init():
        or_ref[ix] = pr
        oi_ref[ix] = pi
        xx_ref[ix] = sxx
        yy_ref[ix] = syy

    @pl.when(i > 0)
    def _accum():
        or_ref[ix] = or_ref[ix] + pr
        oi_ref[ix] = oi_ref[ix] + pi
        xx_ref[ix] = xx_ref[ix] + sxx
        yy_ref[ix] = yy_ref[ix] + syy


def _kernel_welch_accum_c2c(ra_ref, rb_ref, ia_ref, ib_ref, w_ref, o_ref,
                            *, n, n1, n2, factors, nperseg, hop, K, num,
                            detrend_c, flat=False):
    """Two-sided |X|^2 accumulator for COMPLEX input (IQ data): both
    planar components framed in VMEM, full-spectrum balanced C2C."""
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    kw = dict(nperseg=nperseg, hop=hop, K=K, n=n, num=num,
              detrend_c=detrend_c, block_seg0=i * 128)
    fr = _frames_from_chunks(rd(ra_ref), rd(rb_ref), w_ref[:], **kw)
    fi = _frames_from_chunks(rd(ia_ref), rd(ib_ref), w_ref[:], **kw)
    dr, di = _c2c_bal_split(fr, fi, n=n, n1=n1, n2=n2, factors=factors)
    p = (dr * dr + di * di).T
    ix = slice(None) if flat else 0

    @pl.when(i == 0)
    def _init():
        o_ref[ix] = p

    @pl.when(i > 0)
    def _accum():
        o_ref[ix] = o_ref[ix] + p


def _kernel_spec_split_c2c(ra_ref, rb_ref, ia_ref, ib_ref, w_ref, or_ref,
                           oi_ref, *, n, n1, n2, factors, nperseg, hop,
                           K, num, detrend_c, flat=False):
    """Two-sided framed C2C with split spectra output (complex-input
    spectrogram / segment pipelines)."""
    i = pl.program_id(0 if flat else 1)
    rd = (lambda r: r[:]) if flat else (lambda r: r[0])
    kw = dict(nperseg=nperseg, hop=hop, K=K, n=n, num=num,
              detrend_c=detrend_c, block_seg0=i * 128)
    fr = _frames_from_chunks(rd(ra_ref), rd(rb_ref), w_ref[:], **kw)
    fi = _frames_from_chunks(rd(ia_ref), rd(ib_ref), w_ref[:], **kw)
    dr, di = _c2c_bal_split(fr, fi, n=n, n1=n1, n2=n2, factors=factors)
    ix = slice(None) if flat else 0
    or_ref[ix] = dr.T
    oi_ref[ix] = di.T


def _geom(x, win, nperseg, hop, nfft, detrend, c2c=False):
    """Flatten leading dims and build the padded 3-D chunk view
    [B, rows_pad, hop] plus the shared grid geometry.  x real [..., t];
    the chunk view is padded one extra 128-row block so every main
    block's B-neighbour block exists (zero pad -> masked in-kernel).
    c2c=True keys the C2C balanced table (two-sided variant: out width
    nfft, no half-spectrum cut)."""
    t = x.shape[-1]
    if not fused_welch_ok(t, nperseg, hop, nfft, detrend, c2c=c2c):
        raise Unsupported("outside the fused welch envelope")
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    if B == 0:
        raise Unsupported("zero-size batch")
    K = nperseg // hop
    num = 1 + (t - nperseg) // hop
    nblocks = -(-num // 128)
    rows_pad = (nblocks + 1) * 128
    need = rows_pad * hop
    flat = B == 1  # keep the measured-fast 2-D layout for one signal
    x2 = x.reshape(t) if flat else x.reshape(B, t)
    if flat:
        xp = jnp.pad(x2, (0, need - t)) if need > t else x2[:need]
        chunks = xp.reshape(rows_pad, hop)
    else:
        xp = (jnp.pad(x2, ((0, 0), (0, need - t))) if need > t
              else x2[:, :need])
        chunks = xp.reshape(B, rows_pad, hop)
    w2 = jnp.asarray(win, jnp.float32).reshape(1, nperseg)
    n1, n2, factors = (_BALANCED if c2c else _BALANCED_R2C)[nfft]
    kkw = dict(n=nfft, n1=n1, n2=n2, factors=factors,
               nperseg=nperseg, hop=hop, K=K, num=num,
               detrend_c=(detrend == "constant"), flat=flat)
    if not c2c:
        kkw.update(mp=nfft // 2 + 1, mp_out=pad_bins(nfft))
    geom = dict(
        lead=lead, B=B, K=K, num=num, nblocks=nblocks, rows_pad=rows_pad,
        mp=nfft // 2 + 1, mp_out=nfft if c2c else pad_bins(nfft),
        n1=n1, n2=n2, factors=factors, kkw=kkw, flat=flat,
        grid=(nblocks,) if flat else (B, nblocks),
    )
    return chunks, w2, geom


def _chunks_like(v, g, hop):
    """Second-signal chunk view with geometry already computed by _geom
    (same shape contract as the first signal)."""
    t = v.shape[-1]
    need = g["rows_pad"] * hop
    if g["flat"]:
        v2 = v.reshape(t)
        vp = jnp.pad(v2, (0, need - t)) if need > t else v2[:need]
        return vp.reshape(g["rows_pad"], hop)
    v2 = v.reshape(g["B"], t)
    vp = (jnp.pad(v2, ((0, 0), (0, need - t))) if need > t
          else v2[:, :need])
    return vp.reshape(g["B"], g["rows_pad"], hop)


def _specs(g, hop, nperseg, accumulate):
    """(chunk_a, chunk_b, win, out) BlockSpecs.  flat (B==1): 2-D blocks
    over grid (nblocks,) — measurably faster than a unit leading dim
    (PERFORMANCE round-5h); batched: 3-D blocks over grid (B, nblocks)."""
    mo = g["mp_out"]
    if g["flat"]:
        a = pl.BlockSpec((128, hop), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        bb = pl.BlockSpec((128, hop), lambda i: (i + 1, 0),
                          memory_space=pltpu.VMEM)
        w = pl.BlockSpec((1, nperseg), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
        if accumulate:
            o = pl.BlockSpec((128, mo), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            rows = 128
        else:
            o = pl.BlockSpec((128, mo), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
            rows = g["nblocks"] * 128
        return a, bb, w, o, rows
    a = pl.BlockSpec((1, 128, hop), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM)
    bb = pl.BlockSpec((1, 128, hop), lambda b, i: (b, i + 1, 0),
                      memory_space=pltpu.VMEM)
    w = pl.BlockSpec((1, nperseg), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM)
    if accumulate:
        o = pl.BlockSpec((1, 128, mo), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
        rows = 128
    else:
        o = pl.BlockSpec((1, 128, mo), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
        rows = g["nblocks"] * 128
    return a, bb, w, o, rows


_PARAMS = dict(vmem_limit_bytes=127 * 1024 * 1024)


def csd_accum_split(x, y, win, nperseg, hop, nfft, detrend, *,
                    interpret=False):
    """Fused csd core: real [..., t] x, y -> (Pr, Pi [..., nfft//2+1],
    num) with P = sum_s conj(X_s) * Y_s (scipy csd convention); the
    caller applies mean/norm/one-sided doubling on the tiny vectors."""
    if y.shape != x.shape:
        raise Unsupported("fused csd takes equal-shape signals")
    cx, w2, g = _geom(x, win, nperseg, hop, nfft, detrend)
    cy = _chunks_like(y, g, hop)
    kern = functools.partial(_kernel_csd_accum, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, True)
    oshape = ((rows, g["mp_out"]) if g["flat"]
              else (g["B"], rows, g["mp_out"]))
    pr, pi = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sa, sb, sw],
        out_specs=[so, so],
        out_shape=[jax.ShapeDtypeStruct(oshape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * (8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (4 * g["rows_pad"] * hop
                                         + 2 * rows * g["mp_out"]),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(cx, cx, cy, cy, w2)
    m = g["mp"]
    ax = 0 if g["flat"] else 1
    shape = (*g["lead"], m)
    return (jnp.sum(pr, axis=ax)[..., :m].reshape(shape),
            jnp.sum(pi, axis=ax)[..., :m].reshape(shape), g["num"])


def coherence_accum_split(x, y, win, nperseg, hop, nfft, detrend, *,
                          interpret=False):
    """Fused coherence core: real [..., t] x, y -> (Pr, Pi, Sxx, Syy
    [..., nfft//2+1], num) in ONE kernel pass (conj(X)Y, |X|^2, |Y|^2
    accumulated together); coherence = |P|^2 / (Sxx Syy) needs no
    normalization constants at all (they cancel)."""
    if y.shape != x.shape:
        raise Unsupported("fused coherence takes equal-shape signals")
    cx, w2, g = _geom(x, win, nperseg, hop, nfft, detrend)
    cy = _chunks_like(y, g, hop)
    kern = functools.partial(_kernel_coh_accum, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, True)
    oshape = ((rows, g["mp_out"]) if g["flat"]
              else (g["B"], rows, g["mp_out"]))
    outs = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sa, sb, sw],
        out_specs=[so, so, so, so],
        out_shape=[jax.ShapeDtypeStruct(oshape, jnp.float32)] * 4,
        cost_estimate=pl.CostEstimate(
            flops=2 * (8 * nfft * (g["n1"] + g["n2"]) + 14 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (4 * g["rows_pad"] * hop
                                         + 4 * rows * g["mp_out"]),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(cx, cx, cy, cy, w2)
    m = g["mp"]
    ax = 0 if g["flat"] else 1
    shape = (*g["lead"], m)
    res = [jnp.sum(o, axis=ax)[..., :m].reshape(shape) for o in outs]
    return (*res, g["num"])


def welch_accum_split(x, win, nperseg, hop, nfft, detrend, *,
                      interpret=False):
    """Fused welch core: real [..., t] x -> (power_sum [..., nfft//2+1],
    num).

    power_sum[.., b] = sum over all `num` segments of
    |RFFT(win * detrend(frame_s))[b]|^2 — the caller applies the 1/num
    mean, density/spectrum norm and the one-sided doubling on this TINY
    vector.  One kernel pass over the signal; HBM traffic ~2 signal
    reads + a [128, pad_bins] accumulator per batch row."""
    chunks, w2, g = _geom(x, win, nperseg, hop, nfft, detrend)
    kern = functools.partial(_kernel_welch_accum, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, True)
    oshape = ((rows, g["mp_out"]) if g["flat"]
              else (g["B"], rows, g["mp_out"]))
    acc = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sw],
        out_specs=so,
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (2 * g["rows_pad"] * hop
                                         + rows * g["mp_out"]),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(chunks, chunks, w2)
    m = g["mp"]
    ax = 0 if g["flat"] else 1
    return (jnp.sum(acc, axis=ax)[..., :m].reshape(*g["lead"], m),
            g["num"])


def spec_psd_split(x, win, nperseg, hop, nfft, detrend, *,
                   interpret=False):
    """Fused per-segment power spectra: real [..., t] x ->
    [..., num, nfft//2+1] (spectrogram mode=psd core; caller scales)."""
    chunks, w2, g = _geom(x, win, nperseg, hop, nfft, detrend)
    kern = functools.partial(_kernel_spec_psd, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, False)
    oshape = ((rows, g["mp_out"]) if g["flat"]
              else (g["B"], rows, g["mp_out"]))
    out = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sw],
        out_specs=so,
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (2 * g["rows_pad"] * hop
                                         + rows * g["mp_out"]),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(chunks, chunks, w2)
    cut = (out[:g["num"], :g["mp"]] if g["flat"]
           else out[:, :g["num"], :g["mp"]])
    return cut.reshape(*g["lead"], g["num"], g["mp"])


def spec_rfft_split(x, win, nperseg, hop, nfft, detrend, *,
                    pad_out=False, roll_s=0, interpret=False):
    """Fused framed R2C: real [..., t] x -> split spectra
    [..., num, bins] (bins = pad_bins(nfft) with pad_out else
    nfft//2+1) — the _spec_segments_split hot path without the frame
    materialization.  roll_s left-rolls each nfft-padded frame before
    the transform (ShortTimeFFT phase_shift semantics)."""
    chunks, w2, g = _geom(x, win, nperseg, hop, nfft, detrend)
    kern = functools.partial(_kernel_spec_split, roll_s=roll_s,
                             **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, False)
    oshape = ((rows, g["mp_out"]) if g["flat"]
              else (g["B"], rows, g["mp_out"]))
    Xr, Xi = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sw],
        out_specs=[so, so],
        out_shape=[jax.ShapeDtypeStruct(oshape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=(8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (2 * g["rows_pad"] * hop
                                         + 2 * rows * g["mp_out"]),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(chunks, chunks, w2)
    bins = g["mp_out"] if pad_out else g["mp"]
    shp = (*g["lead"], g["num"], bins)
    if g["flat"]:
        return (Xr[:g["num"], :bins].reshape(shp),
                Xi[:g["num"], :bins].reshape(shp))
    return (Xr[:, :g["num"], :bins].reshape(shp),
            Xi[:, :g["num"], :bins].reshape(shp))


def welch_accum_c2c_split(re, im, win, nperseg, hop, nfft, detrend, *,
                          interpret=False):
    """Fused two-sided welch core for COMPLEX input: planar (re, im)
    [..., t] -> (power_sum [..., nfft], num) with full-spectrum bins in
    natural (unshifted) order, scipy two-sided convention."""
    if im.shape != re.shape:
        raise Unsupported("re/im components must have equal shapes")
    cr, w2, g = _geom(re, win, nperseg, hop, nfft, detrend, c2c=True)
    ci = _chunks_like(im, g, hop)
    kern = functools.partial(_kernel_welch_accum_c2c, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, True)
    oshape = (rows, nfft) if g["flat"] else (g["B"], rows, nfft)
    acc = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sa, sb, sw],
        out_specs=so,
        out_shape=jax.ShapeDtypeStruct(oshape, jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * (8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (4 * g["rows_pad"] * hop
                                         + rows * nfft),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(cr, cr, ci, ci, w2)
    ax = 0 if g["flat"] else 1
    return jnp.sum(acc, axis=ax).reshape(*g["lead"], nfft), g["num"]


def spec_c2c_split(re, im, win, nperseg, hop, nfft, detrend, *,
                   interpret=False):
    """Fused two-sided framed C2C: planar (re, im) [..., t] -> split
    spectra [..., num, nfft] (complex-input spectrogram core)."""
    if im.shape != re.shape:
        raise Unsupported("re/im components must have equal shapes")
    cr, w2, g = _geom(re, win, nperseg, hop, nfft, detrend, c2c=True)
    ci = _chunks_like(im, g, hop)
    kern = functools.partial(_kernel_spec_split_c2c, **g["kkw"])
    sa, sb, sw, so, rows = _specs(g, hop, nperseg, False)
    oshape = (rows, nfft) if g["flat"] else (g["B"], rows, nfft)
    Xr, Xi = pl.pallas_call(
        kern,
        grid=g["grid"],
        in_specs=[sa, sb, sa, sb, sw],
        out_specs=[so, so],
        out_shape=[jax.ShapeDtypeStruct(oshape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * (8 * nfft * (g["n1"] + g["n2"]) + 10 * nfft)
            * g["B"] * g["nblocks"] * 128,
            bytes_accessed=4 * g["B"] * (4 * g["rows_pad"] * hop
                                         + 2 * rows * nfft),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(**_PARAMS),
        interpret=_interp(interpret),
    )(cr, cr, ci, ci, w2)
    shp = (*g["lead"], g["num"], nfft)
    if g["flat"]:
        return (Xr[:g["num"]].reshape(shp), Xi[:g["num"]].reshape(shp))
    return (Xr[:, :g["num"]].reshape(shp), Xi[:, :g["num"]].reshape(shp))
