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
    _BALANCED_R2C,
    Unsupported,
    _dot_prec,
    _gen_dft,
    _gen_twiddle,
    _interp,
    _round_up,
    _vpu_dft_leading_real,
    pad_bins,
)

__all__ = ["welch_accum_split", "csd_accum_split", "spec_psd_split",
           "spec_rfft_split", "fused_welch_ok"]

_MAX_K = 8  # frames spanning more than 8 hop-chunks: composed path


def fused_welch_ok(t: int, nperseg: int, hop: int, nfft: int,
                   detrend) -> bool:
    """Envelope of the fused segment-spectrum kernels."""
    return (
        nfft in _BALANCED_R2C
        and nfft >= nperseg
        and 0 < hop <= nperseg
        and nperseg % hop == 0
        and nperseg // hop <= _MAX_K
        and t >= nperseg
        and detrend in (False, None, "constant")
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
    [mp_out, 128] PRE-transpose (bins > n/2 zeroed) — the
    _kernel_r2c_bal math without the store."""
    bt = frames.shape[0]
    ar = frames.T.reshape(n1, n2, bt)
    br, bi = _vpu_dft_leading_real(ar, n1, -1, factors)
    twr, twi = _gen_twiddle(n1, n2, n, -1)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    k2_rows = _round_up(mp // n1 + 1, 8)
    w2r, w2i = _gen_dft(k2_rows, n2, n2, -1, 1.0)
    wbig = jnp.concatenate(
        [jnp.concatenate([w2r, -w2i], axis=1),
         jnp.concatenate([w2i, w2r], axis=1)], axis=0)
    xcat = jnp.concatenate([cr, ci], axis=1)
    res = _dot_prec(wbig, xcat, ((1,), (1,)))
    dr = _cut_mask(res[:k2_rows].reshape(k2_rows * n1, bt), mp, mp_out, bt)
    di = _cut_mask(res[k2_rows:].reshape(k2_rows * n1, bt), mp, mp_out, bt)
    return dr, di


def _r2c_power(frames, *, n, n1, n2, factors, mp, mp_out):
    """Balanced R2C power |X|^2 of [128, n] real frames -> [128, mp_out]."""
    dr, di = _r2c_bal_split(frames, n=n, n1=n1, n2=n2, factors=factors,
                            mp=mp, mp_out=mp_out)
    return (dr * dr + di * di).T  # [bt, mp_out]


def _frames_from_chunks(a, b, w, *, nperseg, hop, K, n, num, detrend_c,
                        block_seg0):
    """[128, hop] x2 adjacent chunk blocks -> detrended, windowed,
    validity-masked frames [128, n] (zero-padded to nfft=n)."""
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
    return frames


def _kernel_welch_accum(a_ref, b_ref, w_ref, o_ref, *, n, n1, n2, factors,
                        mp, mp_out, nperseg, hop, K, num, detrend_c):
    i = pl.program_id(0)
    frames = _frames_from_chunks(
        a_ref[:], b_ref[:], w_ref[:], nperseg=nperseg, hop=hop, K=K, n=n,
        num=num, detrend_c=detrend_c, block_seg0=i * 128)
    p = _r2c_power(frames, n=n, n1=n1, n2=n2, factors=factors, mp=mp,
                   mp_out=mp_out)

    @pl.when(i == 0)
    def _init():
        o_ref[:] = p

    @pl.when(i > 0)
    def _accum():
        o_ref[:] = o_ref[:] + p


def _kernel_spec_psd(a_ref, b_ref, w_ref, o_ref, *, n, n1, n2, factors,
                     mp, mp_out, nperseg, hop, K, num, detrend_c):
    i = pl.program_id(0)
    frames = _frames_from_chunks(
        a_ref[:], b_ref[:], w_ref[:], nperseg=nperseg, hop=hop, K=K, n=n,
        num=num, detrend_c=detrend_c, block_seg0=i * 128)
    o_ref[:] = _r2c_power(frames, n=n, n1=n1, n2=n2, factors=factors,
                          mp=mp, mp_out=mp_out)


def _kernel_spec_split(a_ref, b_ref, w_ref, or_ref, oi_ref, *, n, n1, n2,
                       factors, mp, mp_out, nperseg, hop, K, num,
                       detrend_c):
    """Framed R2C with SPLIT spectra output (the stft/_spec_segments
    building block): frames built in VMEM, spectra written per segment."""
    i = pl.program_id(0)
    frames = _frames_from_chunks(
        a_ref[:], b_ref[:], w_ref[:], nperseg=nperseg, hop=hop, K=K, n=n,
        num=num, detrend_c=detrend_c, block_seg0=i * 128)
    dr, di = _r2c_bal_split(frames, n=n, n1=n1, n2=n2, factors=factors,
                            mp=mp, mp_out=mp_out)
    or_ref[:] = dr.T
    oi_ref[:] = di.T


def _kernel_csd_accum(xa_ref, xb_ref, ya_ref, yb_ref, w_ref, or_ref,
                      oi_ref, *, n, n1, n2, factors, mp, mp_out, nperseg,
                      hop, K, num, detrend_c):
    """Cross-spectrum accumulator: sum_s conj(X_s) * Y_s (scipy csd
    convention) — both signals framed, transformed and cross-multiplied
    in one pass."""
    i = pl.program_id(0)
    kw = dict(nperseg=nperseg, hop=hop, K=K, n=n, num=num,
              detrend_c=detrend_c, block_seg0=i * 128)
    fx = _frames_from_chunks(xa_ref[:], xb_ref[:], w_ref[:], **kw)
    fy = _frames_from_chunks(ya_ref[:], yb_ref[:], w_ref[:], **kw)
    mkw = dict(n=n, n1=n1, n2=n2, factors=factors, mp=mp, mp_out=mp_out)
    xr, xi = _r2c_bal_split(fx, **mkw)
    yr, yi = _r2c_bal_split(fy, **mkw)
    pr = (xr * yr + xi * yi).T  # Re(conj(X) Y)
    pi = (xr * yi - xi * yr).T  # Im(conj(X) Y)

    @pl.when(i == 0)
    def _init():
        or_ref[:] = pr
        oi_ref[:] = pi

    @pl.when(i > 0)
    def _accum():
        or_ref[:] = or_ref[:] + pr
        oi_ref[:] = oi_ref[:] + pi


def _launch(x, win, nperseg, hop, nfft, detrend, *, accumulate,
            interpret=False):
    t = x.shape[-1]
    if x.ndim != 1:
        raise Unsupported("fused segment kernels take 1-D signals")
    if not fused_welch_ok(t, nperseg, hop, nfft, detrend):
        raise Unsupported("outside the fused welch envelope")
    K = nperseg // hop
    num = 1 + (t - nperseg) // hop
    nblocks = -(-num // 128)
    # chunk view padded so block nblocks-1's B-neighbour block exists
    rows_pad = (nblocks + 1) * 128
    need = rows_pad * hop
    xp = jnp.pad(x, (0, need - t)) if need > t else x[:need]
    chunks = xp.reshape(rows_pad, hop)
    w2 = jnp.asarray(win, jnp.float32).reshape(1, nperseg)

    n1, n2, factors = _BALANCED_R2C[nfft]
    mp = nfft // 2 + 1
    mp_out = pad_bins(nfft)
    kern = functools.partial(
        _kernel_welch_accum if accumulate else _kernel_spec_psd,
        n=nfft, n1=n1, n2=n2, factors=factors, mp=mp, mp_out=mp_out,
        nperseg=nperseg, hop=hop, K=K, num=num,
        detrend_c=(detrend == "constant"))

    chunk_spec_a = pl.BlockSpec((128, hop), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    chunk_spec_b = pl.BlockSpec((128, hop), lambda i: (i + 1, 0),
                                memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((1, nperseg), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    if accumulate:
        out_rows, out_spec = 128, pl.BlockSpec(
            (128, mp_out), lambda i: (0, 0), memory_space=pltpu.VMEM)
    else:
        out_rows, out_spec = nblocks * 128, pl.BlockSpec(
            (128, mp_out), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[chunk_spec_a, chunk_spec_b, win_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, mp_out), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(8 * nfft * (n1 + n2) + 10 * nfft) * nblocks * 128,
            bytes_accessed=4 * (2 * rows_pad * hop + out_rows * mp_out),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(chunks, chunks, w2)
    return out, num


def csd_accum_split(x, y, win, nperseg, hop, nfft, detrend, *,
                    interpret=False):
    """Fused csd core: real 1-D x, y -> (Pr, Pi [nfft//2+1], num) with
    P[b] = sum_s conj(X_s[b]) * Y_s[b] (scipy csd convention); the
    caller applies mean/norm/one-sided doubling on the tiny vectors."""
    t = x.shape[-1]
    if x.ndim != 1 or y.shape != x.shape:
        raise Unsupported("fused csd takes equal-length 1-D signals")
    if not fused_welch_ok(t, nperseg, hop, nfft, detrend):
        raise Unsupported("outside the fused welch envelope")
    K = nperseg // hop
    num = 1 + (t - nperseg) // hop
    nblocks = -(-num // 128)
    rows_pad = (nblocks + 1) * 128
    need = rows_pad * hop

    def view(v):
        vp = jnp.pad(v, (0, need - t)) if need > t else v[:need]
        return vp.reshape(rows_pad, hop)

    cx, cy = view(x), view(y)
    w2 = jnp.asarray(win, jnp.float32).reshape(1, nperseg)
    n1, n2, factors = _BALANCED_R2C[nfft]
    mp = nfft // 2 + 1
    mp_out = pad_bins(nfft)
    kern = functools.partial(
        _kernel_csd_accum, n=nfft, n1=n1, n2=n2, factors=factors, mp=mp,
        mp_out=mp_out, nperseg=nperseg, hop=hop, K=K, num=num,
        detrend_c=(detrend == "constant"))
    spec_a = pl.BlockSpec((128, hop), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((128, hop), lambda i: (i + 1, 0),
                          memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((1, nperseg), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((128, mp_out), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    pr, pi = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[spec_a, spec_b, spec_a, spec_b, win_spec],
        out_specs=[acc_spec, acc_spec],
        out_shape=[jax.ShapeDtypeStruct((128, mp_out), jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=2 * (8 * nfft * (n1 + n2) + 10 * nfft) * nblocks * 128,
            bytes_accessed=4 * (4 * rows_pad * hop + 2 * 128 * mp_out),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(cx, cx, cy, cy, w2)
    m = nfft // 2 + 1
    return jnp.sum(pr, axis=0)[:m], jnp.sum(pi, axis=0)[:m], num


def welch_accum_split(x, win, nperseg, hop, nfft, detrend, *,
                      interpret=False):
    """Fused welch core: real 1-D x -> (power_sum [nfft//2+1], num).

    power_sum[b] = sum over all `num` segments of
    |RFFT(win * detrend(frame_s))[b]|^2 — the caller applies the 1/num
    mean, density/spectrum norm and the one-sided doubling on this TINY
    vector.  One kernel pass over the signal; HBM traffic ~2 signal
    reads + a [128, pad_bins] accumulator."""
    acc, num = _launch(x, win, nperseg, hop, nfft, detrend,
                       accumulate=True, interpret=interpret)
    return jnp.sum(acc, axis=0)[: nfft // 2 + 1], num


def spec_psd_split(x, win, nperseg, hop, nfft, detrend, *,
                   interpret=False):
    """Fused per-segment power spectra: real 1-D x -> [num, nfft//2+1]
    (spectrogram mode='psd' core; caller applies scaling)."""
    out, num = _launch(x, win, nperseg, hop, nfft, detrend,
                       accumulate=False, interpret=interpret)
    return out[:num, : nfft // 2 + 1]


def spec_rfft_split(x, win, nperseg, hop, nfft, detrend, *,
                    pad_out=False, interpret=False):
    """Fused framed R2C: real 1-D x -> split spectra [num, bins]
    (bins = pad_bins(nfft) with pad_out else nfft//2+1) — the
    _spec_segments_split hot path without the frame materialization."""
    t = x.shape[-1]
    if x.ndim != 1:
        raise Unsupported("fused segment kernels take 1-D signals")
    if not fused_welch_ok(t, nperseg, hop, nfft, detrend):
        raise Unsupported("outside the fused welch envelope")
    K = nperseg // hop
    num = 1 + (t - nperseg) // hop
    nblocks = -(-num // 128)
    rows_pad = (nblocks + 1) * 128
    need = rows_pad * hop
    xp = jnp.pad(x, (0, need - t)) if need > t else x[:need]
    chunks = xp.reshape(rows_pad, hop)
    w2 = jnp.asarray(win, jnp.float32).reshape(1, nperseg)
    n1, n2, factors = _BALANCED_R2C[nfft]
    mp = nfft // 2 + 1
    mp_out = pad_bins(nfft)
    kern = functools.partial(
        _kernel_spec_split, n=nfft, n1=n1, n2=n2, factors=factors, mp=mp,
        mp_out=mp_out, nperseg=nperseg, hop=hop, K=K, num=num,
        detrend_c=(detrend == "constant"))
    spec_a = pl.BlockSpec((128, hop), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((128, hop), lambda i: (i + 1, 0),
                          memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((1, nperseg), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((128, mp_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    Xr, Xi = pl.pallas_call(
        kern,
        grid=(nblocks,),
        in_specs=[spec_a, spec_b, win_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((nblocks * 128, mp_out),
                                        jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=(8 * nfft * (n1 + n2) + 10 * nfft) * nblocks * 128,
            bytes_accessed=4 * (2 * rows_pad * hop
                                + 2 * nblocks * 128 * mp_out),
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(chunks, chunks, w2)
    bins = mp_out if pad_out else mp
    return Xr[:num, :bins], Xi[:num, :bins]
