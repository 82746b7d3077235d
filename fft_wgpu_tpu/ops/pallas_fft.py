"""Fused VMEM-resident batched FFT — the Pallas fast path.

TPU-native re-realization of the reference's production kernel
(fft_wgpu src/kernel/fft4.wgsl): where fft4 computes the *entire* transform
of one row per workgroup in a single dispatch (stage loop + barrier per
stage, fft4.wgsl:36-101), this kernel computes the entire transform of a
tile of rows per grid step with every intermediate resident in VMEM — one
HBM read and one HBM write per element, pinned to the HBM-bandwidth
roofline with Pallas's automatic input/output double-buffering overlapping
DMA and compute across grid steps.

Algorithm: two-factor four-step with n = n1 * n2 (n2 = 128, the lane
width).  Per row, viewing the row as A[n1, n2] (row-major):

    B = W1 @ A            n1-point DFTs            (MXU)
    C = B * tw[k1, n2]    inter-factor twiddle     (VPU)
    D = W2 @ C^T          n2-point DFTs            (MXU)
    X[k1 + n1*k2] = D[k2, k1]   natural order, no bit reversal

The corner turns that make this hard on TPU (Mosaic cannot merge vector
sublane dims into the 128-lane dim) are *fused into the matmuls* by
choosing dot_general operand orders whose result index order IS the
corner-turned layout:

    stage 1:  dot(W1[k1,m1], A[bt,m1,n2] over m1) -> [k1, bt, n2]
              (batch migrates inward during the MXU pass — free transpose)
    stage 2:  dot(W2[k2,m2], C[k1,bt,m2] over m2) -> [k2, k1, bt]
              whose reshape to [n, bt] is a pure sublane merge: the
              Stockham autosort output reindexing (reference
              out = s*2J + j, fft4.wgsl:61-70) becomes a zero-cost
              relabeling

leaving exactly one real transpose ([n, bt] -> [bt, n]) per tile on the
output path.

Ragged batch/lane edges rely on Pallas's masked edge blocks; this is safe
because every kernel here is row/column independent — garbage in masked
input positions can only influence masked output positions.

The DFT matrices and twiddles are f64-generated host constants cast to
f32, mirroring the reference's host-side f64 twiddle precompute
(processor.rs:43-49) but baked into the executable instead of bound as a
storage buffer.  The inverse is the same kernel with conjugated constants,
and any output scale (1/N normalize, ortho) is folded into W2 — the
reference's fused last-stage divide (ifft.wgsl:65-74) at zero runtime
cost.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fft_batched_split", "Unsupported", "FUSED_MIN_N",
           "FUSED_MAX_N", "pad_bins"]

FUSED_MIN_N = 128
FUSED_MAX_N = 16384  # fits VMEM since the real-matrix stage-1 slimmed liveness

# Test hook: force EVERY pallas_call in this module into interpret mode
# (tests/test_padded_adoption.py runs the real TPU routing on the CPU
# backend this way; the newer pltpu.force_tpu_interpret_mode cannot be
# used because its IO-callback lowering carries effects that
# jax.custom_derivatives.linear_call rejects).
_FORCE_INTERPRET = False


def _interp(flag):
    return bool(flag) or _FORCE_INTERPRET

_MM_PREC = jax.lax.Precision.HIGHEST

# Matmul precision mode for the DFT stages:
#   "highest" — XLA f32-on-MXU (6 bf16 passes per real matmul)
#   "bf16x3"  — manual hi/lo bf16 split, 3 passes per real matmul.
# Measured on v5e: bf16x3 is SLOWER (the VPU hi/lo data splits outweigh the
# saved MXU passes) and accuracy-marginal (~1e-5); keep "highest".
PRECISION_MODE = "highest"


def _split_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


class Unsupported(Exception):
    """Shape/dtype outside the fused kernel's envelope (caller falls back)."""


def _choose_split(n: int) -> tuple[int, int]:
    """n = n1 * n2 with n2 = 128 (the lane width)."""
    return n // 128, 128


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _row_tile(n: int) -> int:
    """Rows per grid step (must be a multiple of 128: the kernel's
    sublane<->lane shape casts need full-vreg minors).

    Measured on v5e: 128 is best for n >= 1024; small transforms benefit
    from 256-row tiles (bigger blocks amortize per-step overhead:
    n=512 x 2560 drops 0.090 -> 0.074 ms)."""
    return 256 if n <= 512 else 128


def _gen_dft(nk, nm, n_mod, sign, scale=1.0):
    """In-register DFT matrix: W[k, m] = scale * exp(sign*2pi*i*(k*m % n_mod)/n_mod).

    This is the BASELINE north-star design point: twiddles generated on the
    VPU per tile (fractions of a us) instead of bound as buffers (the
    reference binds a host-precomputed LUT, processor.rs:51-55) — it also
    keeps the Pallas pipeline free of constant-input streams.  The k*m
    product stays < 2^24 for every factor used here, so f32 index math is
    exact, and the explicit mod keeps phases small (full f32 trig accuracy).
    """
    k = jax.lax.broadcasted_iota(jnp.int32, (nk, nm), 0).astype(jnp.float32)
    m = jax.lax.broadcasted_iota(jnp.int32, (nk, nm), 1).astype(jnp.float32)
    t = k * m
    r = t - n_mod * jnp.floor(t / n_mod)
    theta = (sign * 2.0 * math.pi / n_mod) * r
    return jnp.cos(theta) * scale, jnp.sin(theta) * scale


def _gen_twiddle(n1, n2, n, sign):
    """tw[k1, m2] = exp(sign*2pi*i*(k1*m2 % n)/n), generated in-register."""
    k = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 0).astype(jnp.float32)
    m = jax.lax.broadcasted_iota(jnp.int32, (n1, n2), 1).astype(jnp.float32)
    t = k * m
    r = t - n * jnp.floor(t / n)
    theta = (sign * 2.0 * math.pi / n) * r
    return jnp.cos(theta), jnp.sin(theta)


# Outer four-step twiddle form in the transposed-rows kernels
# (probe_r40).  "direct": one [bt, n] (or [n, bt]) in-register table per
# grid step — bt*n/1024 K transcendental pairs (512K at n=4096).
# "factored": split the column index m = 128 q + l so
# w_N^(r m) = w_{N/128}^(r q) * w_N^(r l) — two tables of [bt, n/128]
# and [bt, 128] (<=20K entries) and one extra broadcast complex
# multiply on the state.  Measured on v5e (probe_r40): factored wins
# 1.20-1.21x through the four-step (2^21x8 2.002 vs 2.411 ms, 2^22x4
# 1.959 vs 2.367); rel 1.3e-07 vs f64 oracle unchanged.
OUTER_TW_FORM = "factored"


def _iota_tw(shape, dim0_off, n_mod, sign):
    """In-register table w_{n_mod}^{(off + i0) * i1} over `shape` (rank 2)."""
    a = (dim0_off + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
         ).astype(jnp.float32)
    b = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    t = a * b
    r = t - n_mod * jnp.floor(t / n_mod)
    theta = (sign * 2.0 * math.pi / n_mod) * r
    return jnp.cos(theta), jnp.sin(theta)


def _outer_tw_mul_rows(ar, ai, row0, n, outer_n, sign):
    """Apply w_N^{r m} to [bt, n] state (rows r on sublanes)."""
    bt = ar.shape[0]
    if OUTER_TW_FORM == "factored" and n % 128 == 0 and n >= 256:
        q_cnt = n // 128
        t1r, t1i = _iota_tw((bt, q_cnt), row0, outer_n // 128, sign)
        t2r, t2i = _iota_tw((bt, 128), row0, outer_n, sign)
        a3r = ar.reshape(bt, q_cnt, 128)
        a3i = ai.reshape(bt, q_cnt, 128)
        cr = a3r * t2r[:, None, :] - a3i * t2i[:, None, :]
        ci = a3r * t2i[:, None, :] + a3i * t2r[:, None, :]
        dr = cr * t1r[:, :, None] - ci * t1i[:, :, None]
        di = cr * t1i[:, :, None] + ci * t1r[:, :, None]
        return dr.reshape(bt, n), di.reshape(bt, n)
    twr, twi = _iota_tw((bt, n), row0, outer_n, sign)
    return ar * twr - ai * twi, ar * twi + ai * twr


def _outer_tw_mul_rows_t(ar, ai, row0, n, outer_n, sign):
    """Apply w_N^{r m} to TRANSPOSED [n, bt] state (m on sublanes)."""
    bt = ar.shape[1]
    if OUTER_TW_FORM == "factored" and n % 128 == 0 and n >= 256:
        q_cnt = n // 128
        # T1[q, r] = w_{N/128}^{q (row0+r)}; T2[l, r] = w_N^{l (row0+r)}
        q = jax.lax.broadcasted_iota(jnp.int32, (q_cnt, bt), 0
                                     ).astype(jnp.float32)
        r1 = (row0 + jax.lax.broadcasted_iota(jnp.int32, (q_cnt, bt), 1)
              ).astype(jnp.float32)
        n1mod = outer_n // 128
        t = q * r1
        rr = t - n1mod * jnp.floor(t / n1mod)
        th = (sign * 2.0 * math.pi / n1mod) * rr
        t1r, t1i = jnp.cos(th), jnp.sin(th)
        el = jax.lax.broadcasted_iota(jnp.int32, (128, bt), 0
                                      ).astype(jnp.float32)
        r2 = (row0 + jax.lax.broadcasted_iota(jnp.int32, (128, bt), 1)
              ).astype(jnp.float32)
        t = el * r2
        rr = t - outer_n * jnp.floor(t / outer_n)
        th = (sign * 2.0 * math.pi / outer_n) * rr
        t2r, t2i = jnp.cos(th), jnp.sin(th)
        a3r = ar.reshape(q_cnt, 128, bt)
        a3i = ai.reshape(q_cnt, 128, bt)
        cr = a3r * t2r[None] - a3i * t2i[None]
        ci = a3r * t2i[None] + a3i * t2r[None]
        dr = cr * t1r[:, None, :] - ci * t1i[:, None, :]
        di = cr * t1i[:, None, :] + ci * t1r[:, None, :]
        return dr.reshape(n, bt), di.reshape(n, bt)
    m2 = jax.lax.broadcasted_iota(jnp.int32, (n, bt), 0).astype(jnp.float32)
    r = (row0 + jax.lax.broadcasted_iota(jnp.int32, (n, bt), 1)
         ).astype(jnp.float32)
    t = r * m2
    rr = t - outer_n * jnp.floor(t / outer_n)
    theta = (sign * 2.0 * math.pi / outer_n) * rr
    twr = jnp.cos(theta)
    twi = jnp.sin(theta)
    return ar * twr - ai * twi, ar * twi + ai * twr


def _dot_prec(w, x, dims):
    """ONE real matmul under the global PRECISION_MODE.

    Every constant-W dot in this file routes through here so no kernel
    can silently diverge from the selected dot-precision path (ADVICE r4:
    _cdot_realcat_cut and the _kernel_r2c_gen stage-1 dot used to skip
    the bf16x3 branch).
    """
    if PRECISION_MODE == "bf16x3":
        wh, wl = _split_bf16(w)
        xh, xl = _split_bf16(x)
        d = lambda a, b: jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
        return d(wh, xh) + d(wh, xl) + d(wl, xh)
    return jax.lax.dot_general(
        w, x, (dims, ((), ())), precision=_MM_PREC,
        preferred_element_type=jnp.float32)


def _cdot(w_r, w_s, w_d, xr, xi, dims):
    """Gauss 3-mult complex product W . X with constant W.

    W = Wr + i*Wi; constants are (Wr, Wr+Wi, Wi-Wr):
      m1 = Wr . (xr + xi); m2 = (Wr+Wi) . xi; m3 = (Wi-Wr) . xr
      re = m1 - m2, im = m1 + m3    (3 real matmuls instead of 4)

    PRECISION_MODE selects f32-on-MXU or manual bf16 hi/lo 3-pass.
    """
    m1 = _dot_prec(w_r, xr + xi, dims)
    m2 = _dot_prec(w_s, xi, dims)
    m3 = _dot_prec(w_d, xr, dims)
    return m1 - m2, m1 + m3



def _cdot_realcat(n1, sign, xr, xi, cat_axis, dims, scale=1.0):
    """Stage-1 complex DFT as ONE real matmul.

    For small factors (2*n1 <= 128) three Gauss dots at K=n1 badly
    under-fill the 128-wide MXU; the real-matrix form

        [Br]   [ Wr  -Wi ] [xr]
        [Bi] = [ Wi   Wr ] [xi]

    contracts K = 2*n1 in a single dot — measured ~3x faster at n1=32.
    Returns (br, bi) sliced from the stacked result's leading axis.
    `scale` is folded into the constants (zero runtime cost).
    """
    wr, wi = _gen_dft(n1, n1, n1, sign, scale)
    wbig = jnp.concatenate(
        [jnp.concatenate([wr, -wi], axis=1),
         jnp.concatenate([wi, wr], axis=1)], axis=0)
    xcat = jnp.concatenate([xr, xi], axis=cat_axis)
    res = _dot_prec(wbig, xcat, dims)
    return res[:n1], res[n1:]


# --------------------------------------------------------------------- #
# Generic sublane-domain DFT: multi-level DIT factor chain.
# --------------------------------------------------------------------- #
#
# Measured MXU truths on v5e (scripts/probe_r2/r3/r4):
#   * [64,64]- and [128,128]-shaped f32 dots run at the full MAC rate
#     (6 bf16 passes per real matmul); [64,64] Gauss triples and smaller
#     dots do NOT (D-variant: (64,64)-Gauss slower than (64,64)-realcat
#     despite 25% fewer MACs).
#   * in-kernel transposes are nearly free (C-variant == A-variant).
#
# The standard Cooley-Tukey recursion over the SUBLANE axis, contracting
# the MAJOR factor first (the proven two-level pattern of _kernel/_kernel_
# ax0, generalized): for block = f * B (f major),
#
#     Y[k_f, m_B]  = DFT_f over the major index
#     Y[k_f, m_B] *= w_block^(k_f * m_B)
#     recurse on m_B per k_f
#
# The dot moves each new k to the FRONT, so after the chain the leading
# dims are [k_L, .., k_1] whose flatten IS the natural output order
# X[k_1 + f_1 k_2 + f_1 f_2 k_3 ...] — no bit reversal, no corner turn.
# Factors come from {32, 64} (full-rate realcat atoms) plus pure-VPU
# butterflies for {2,4,8} tails, a MAC floor of 256 f32 MACs/point for
# every power of two n >= 1024 (vs 512/768 for the two-factor schedules).


def _dit_schedule(S: int) -> tuple[int, ...]:
    """Factor S (power of two) into (major..minor) DIT factors: small
    pure-VPU factors {2,4,8} FIRST, full-rate realcat atoms {32, 64} last.

    Ordering matters for vreg packing: the remaining-block size B is the
    second-minor dim of every stage's operand, so it must stay a sublane
    multiple (>= 8, ideally >= 32) until the final stage — small factors
    last would leave B in {2,4} next to the lane dim (half-empty vregs,
    measured 1.8x slower at n=4096)."""
    table = {
        2: (2,), 4: (4,), 8: (8,),
        16: (4, 4),
        32: (32,),
        64: (64,),
        128: (4, 32),
        256: (4, 64),
        512: (4, 4, 32),
        1024: (32, 32),
        2048: (2, 32, 32),
        4096: (4, 32, 32),
        8192: (8, 32, 32),
        # probe_r23 (v5e, tall [S,128] operands): VPU-heavy chain beats
        # realcat32 pairs — 16384 rows 1.133 -> 0.913 ms, bigfft 2^21
        # 0.268 -> 0.241; (4,4,8,128) crashes the compile service
        16384: (4, 4, 4, 4, 64),
        # 2^22 single-pass (probe_r41): with the factored outer twiddle
        # the VMEM math suggests the tall [32768, 128] form fits, but the
        # compile service HANGS >20 min on the kernel (same failure mode
        # as the R2C 16384 big-n1 kernel, probe_r32) — bigfft keeps
        # BIG_MAX_N = 2^21.  The schedule stays for the sublane-chain
        # callers that only slice it.
        32768: (4, 4, 4, 8, 64),
    }
    if S not in table:
        raise Unsupported(f"no DIT schedule for S={S}")
    return table[S]


def _stack0(parts_r, parts_i):
    return (jnp.concatenate([p[None] for p in parts_r], 0),
            jnp.concatenate([p[None] for p in parts_i], 0))


def _stage_dft(xr, xi, f: int, dim: int, sign: int, scale: float):
    """Complex DFT of size f contracting `dim` (0 or 1) of xr/xi, in the
    fastest measured form for the factor size; the new k lands at dim 0."""
    idx = (slice(None),) * dim
    if f == 4:
        # radix-2^2: 8 complex adds vs the naive k-loop's 12
        x0r, x1r, x2r, x3r = (xr[idx + (j,)] for j in range(4))
        x0i, x1i, x2i, x3i = (xi[idx + (j,)] for j in range(4))
        t0r, t0i = x0r + x2r, x0i + x2i
        t1r, t1i = x0r - x2r, x0i - x2i
        t2r, t2i = x1r + x3r, x1i + x3i
        t3r, t3i = x1r - x3r, x1i - x3i
        # X1 = t1 + sign*i*t3 ; X3 = t1 - sign*i*t3  (sign=-1: forward)
        if sign < 0:
            o1r, o1i = t1r + t3i, t1i - t3r
            o3r, o3i = t1r - t3i, t1i + t3r
        else:
            o1r, o1i = t1r - t3i, t1i + t3r
            o3r, o3i = t1r + t3i, t1i - t3r
        outs_r = [t0r + t2r, o1r, t0r - t2r, o3r]
        outs_i = [t0i + t2i, o1i, t0i - t2i, o3i]
        if scale != 1.0:
            outs_r = [scale * v for v in outs_r]
            outs_i = [scale * v for v in outs_i]
        return _stack0(outs_r, outs_i)
    if f == 8:
        # split into two DFT4 (even/odd j) + twiddle combine:
        # X[k]   = E[k] + w8^k O[k],  X[k+4] = E[k] - w8^k O[k]
        # 16 + 8 complex adds + 2 sqrt(1/2) rotations vs ~56 naive
        er = [xr[idx + (j,)] for j in (0, 2, 4, 6)]
        ei = [xi[idx + (j,)] for j in (0, 2, 4, 6)]
        orr = [xr[idx + (j,)] for j in (1, 3, 5, 7)]
        oi = [xi[idx + (j,)] for j in (1, 3, 5, 7)]

        def dft4(vr, vi):
            t0r, t0i = vr[0] + vr[2], vi[0] + vi[2]
            t1r, t1i = vr[0] - vr[2], vi[0] - vi[2]
            t2r, t2i = vr[1] + vr[3], vi[1] + vi[3]
            t3r, t3i = vr[1] - vr[3], vi[1] - vi[3]
            if sign < 0:
                a1 = (t1r + t3i, t1i - t3r)
                a3 = (t1r - t3i, t1i + t3r)
            else:
                a1 = (t1r - t3i, t1i + t3r)
                a3 = (t1r + t3i, t1i - t3r)
            return ([t0r + t2r, a1[0], t0r - t2r, a3[0]],
                    [t0i + t2i, a1[1], t0i - t2i, a3[1]])

        Er, Ei = dft4(er, ei)
        Or, Oi = dft4(orr, oi)
        h = math.sqrt(0.5)
        # w8^k for sign=-1: 1, h(1-i), -i, -h(1+i); conjugate for sign=+1
        tw = [None] * 4
        tw[0] = (Or[0], Oi[0])
        if sign < 0:
            tw[1] = (h * (Or[1] + Oi[1]), h * (Oi[1] - Or[1]))
            tw[2] = (Oi[2], -Or[2])
            tw[3] = (h * (Oi[3] - Or[3]), -h * (Or[3] + Oi[3]))
        else:
            tw[1] = (h * (Or[1] - Oi[1]), h * (Oi[1] + Or[1]))
            tw[2] = (-Oi[2], Or[2])
            tw[3] = (-h * (Or[3] + Oi[3]), h * (Or[3] - Oi[3]))
        outs_r = [Er[k] + tw[k][0] for k in range(4)] \
            + [Er[k] - tw[k][0] for k in range(4)]
        outs_i = [Ei[k] + tw[k][1] for k in range(4)] \
            + [Ei[k] - tw[k][1] for k in range(4)]
        if scale != 1.0:
            outs_r = [scale * v for v in outs_r]
            outs_i = [scale * v for v in outs_i]
        return _stack0(outs_r, outs_i)
    if f <= 8:
        # unrolled VPU butterflies: trace-time-constant unit roots (pure
        # adds for f in {2,4}; adds + sqrt(1/2) rotations for f=8)
        idx = (slice(None),) * dim
        outs_r, outs_i = [], []
        for k in range(f):
            ar = ai = None
            for j in range(f):
                c = scale * math.cos(sign * 2.0 * math.pi * k * j / f)
                s = scale * math.sin(sign * 2.0 * math.pi * k * j / f)
                vr = xr[idx + (j,)]
                vi = xi[idx + (j,)]
                if abs(s) < 1e-12 * abs(scale):
                    tr = vr if c == 1.0 else c * vr
                    ti = vi if c == 1.0 else c * vi
                elif abs(c) < 1e-12 * abs(scale):
                    tr = -s * vi
                    ti = s * vr
                else:
                    tr = c * vr - s * vi
                    ti = c * vi + s * vr
                ar = tr if ar is None else ar + tr
                ai = ti if ai is None else ai + ti
            outs_r.append(ar[None])
            outs_i.append(ai[None])
        return jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0)
    dims = ((1,), (dim,))
    wr, wi = _gen_dft(f, f, f, sign, scale)
    if 2 * f <= 128:
        wbig = jnp.concatenate(
            [jnp.concatenate([wr, -wi], axis=1),
             jnp.concatenate([wi, wr], axis=1)], axis=0)
        xcat = jnp.concatenate([xr, xi], axis=dim)
        res = jax.lax.dot_general(
            wbig, xcat, (dims, ((), ())), precision=_MM_PREC,
            preferred_element_type=jnp.float32)
        return res[:f], res[f:]
    return _cdot(wr, wr + wi, wi - wr, xr, xi, dims)


def _dft_sublane_chain(xr, xi, S: int, sign: int, scale: float = 1.0,
                       factors=None):
    """DFT of size S over the LEADING sublane axis of [S, ...lanes],
    natural output order, `scale` folded into the last stage's constants.

    State between stages is kept flat [S, ...]: leading order
    (k_j, .., k_1, m_B) — every reshape is a pure sublane regroup, the
    accumulated k block is a broadcast spectator for the twiddles, and
    contractions touch dim 0 (first stage) or dim 1 (rest).
    """
    factors = tuple(factors) if factors is not None else _dit_schedule(S)
    if math.prod(factors) != S:
        # without this guard a bad schedule silently computes a partial
        # transform (found via probe_r21: (4,4,64) at S=8192 "won" by
        # doing 1/8th of the work)
        raise Unsupported(f"factors {factors} do not multiply to S={S}")
    rest = xr.shape[1:]
    ones = (1,) * len(rest)
    K, B = 1, S
    for j, f in enumerate(factors):
        last = j == len(factors) - 1
        B //= f
        block = f * B  # this level's DFT block (<= S <= 16384: f32-exact)
        st_scale = scale if last else 1.0
        if K == 1:
            xr = xr.reshape(f, B, *rest)
            xi = xi.reshape(f, B, *rest)
            br, bi = _stage_dft(xr, xi, f, 0, sign, st_scale)
            # [k_f, B, rest]
            if B > 1:
                twr, twi = _gen_dft(f, B, block, sign)
                twr = twr.reshape(f, B, *ones)
                twi = twi.reshape(f, B, *ones)
        elif B == 1:  # final stage: rank-3, no dangling unit dim
            xr = xr.reshape(K, f, *rest)
            xi = xi.reshape(K, f, *rest)
            br, bi = _stage_dft(xr, xi, f, 1, sign, st_scale)
            # [k_f, K, rest]
        else:
            xr = xr.reshape(K, f, B, *rest)
            xi = xi.reshape(K, f, B, *rest)
            br, bi = _stage_dft(xr, xi, f, 1, sign, st_scale)
            # [k_f, K, B, rest]
            if B > 1:
                twr, twi = _gen_dft(f, B, block, sign)
                twr = twr.reshape(f, 1, B, *ones)
                twi = twi.reshape(f, 1, B, *ones)
        if B > 1:
            xr = br * twr - bi * twi
            xi = br * twi + bi * twr
        else:
            xr, xi = br, bi
        K *= f
        xr = xr.reshape(S, *rest)
        xi = xi.reshape(S, *rest)
    return xr, xi


def _kernel_rows_dit(xr_ref, xi_ref, or_ref, oi_ref, *, n, sign, scale,
                     factors):
    """Row-FFT tile via in-kernel transpose + sublane DIT chain: [bt, n] ->
    [n, bt] -> factored DFT over sublanes -> [bt, n].  256 f32 MACs/point
    for n >= 1024 vs the classic two-factor kernel's 512 (and 768 at
    n=16384); the two transposes are ~free (probe_r2 C-variant)."""
    ar = xr_ref[:].T
    ai = xi_ref[:].T
    dr, di = _dft_sublane_chain(ar, ai, n, sign, scale, factors)
    or_ref[:] = dr.T
    oi_ref[:] = di.T


# Stage-1 VPU schedules: n1 -> DIT factors, all in the unrolled-butterfly
# set {2,4,8}.  For these sizes the stage-1 dot badly under-fills the MXU
# (K = 2*n1 of 128), and pure-VPU butterflies beat it outright (probe_r11/
# r12 on v5e: n=512 0.075->0.061, 1024 0.119->0.089, 2048 0.116->0.084,
# 4096 0.885->0.764 ms).  Two-stage chains MUST apply the inter-stage
# twiddle as trace-time scalar multiplies per (k, m) slice — an array
# constant reshaped to (f, B, 1, 1) crashes this Mosaic (HTTP 500).
_VPU_S1_FACTORS = {2: (2,), 4: (4,), 8: (8,), 16: (4, 4), 32: (4, 8)}


def _vpu_dft_leading(xr, xi, S, sign, factors):
    """DFT of size S over the LEADING axis of [S, ...], natural output
    order, via an L-stage unrolled VPU butterfly chain (factors in
    {2,4,8}: pure adds for 2/4, adds + sqrt(1/2) rotations for 8).
    MXU-free stage 1 for the row kernels (see _VPU_S1_FACTORS /
    _BALANCED).

    Every inter-stage twiddle is applied as TRACE-TIME SCALAR constants
    per (k, m) slice — an array twiddle constant reshaped to
    (f, B, 1, 1) crashes this Mosaic toolchain (HTTP 500, probe_r12/r14).
    State between stages stays flat [K*B, ...] with leading digit order
    (k_j, .., k_1, m_B); each stage contracts the current major digit and
    the dot lands the new k at dim 0, so the final flatten IS the natural
    output order (Stockham autosort, no bit reversal)."""
    if len(factors) == 1:
        return _stage_dft(xr, xi, S, 0, sign, 1.0)
    rest = xr.shape[1:]
    f = factors[0]
    B = S // f
    xr = xr.reshape(f, B, *rest)
    xi = xi.reshape(f, B, *rest)
    br, bi = _stage_dft(xr, xi, f, 0, sign, 1.0)  # [k_f, B, rest]
    cr, ci = _scalar_tw_first(br, bi, f, B, S, sign)
    return _vpu_chain_tail(cr.reshape(S, *rest), ci.reshape(S, *rest),
                           S, sign, factors[1:], f)


def _scalar_tw_first(br, bi, f, B, block, sign):
    """Inter-stage twiddle w_block^(k*m) on [k, m, rest] state, folded as
    trace-time scalar constants per (k, m) slice (rank>=3 array constants
    crash this Mosaic — see _vpu_dft_leading docstring)."""
    rows_r, rows_i = [], []
    for k in range(f):
        cols_r, cols_i = [], []
        for m in range(B):
            vr, vi = br[k, m], bi[k, m]
            if k * m % block:
                c = math.cos(sign * 2.0 * math.pi * k * m / block)
                s = math.sin(sign * 2.0 * math.pi * k * m / block)
                vr, vi = c * vr - s * vi, c * vi + s * vr
            cols_r.append(vr[None])
            cols_i.append(vi[None])
        rows_r.append(jnp.concatenate(cols_r, 0)[None])
        rows_i.append(jnp.concatenate(cols_i, 0)[None])
    return jnp.concatenate(rows_r, 0), jnp.concatenate(rows_i, 0)


# Balanced-split row schedule (probe_r13/r14 on v5e): transpose the tile
# in-kernel ([bt,n] -> [n,bt], ~free) so the WHOLE row lives on the sublane
# axis where the factor split is unconstrained — n1 goes to a pure-VPU
# butterfly chain (MXU-free) and n2 stays in the single-dot realcat/Gauss
# form.  MXU cost drops from the lane-pinned (n/128 + 128) MACs/pt to just
# n2: n=4096 (64,64)+(4,4,4) measured 0.771 -> 0.655 ms, 8192 (64,128)+
# (4,4,4) 0.549 -> 0.500, 512 (16,32) 0.061 -> 0.056.  With radix-2^2
# chains 2048 flipped to balanced too (probe_r28) and 4096's chain moved
# to (4,8,2); n<=256 is at the copy floor and stays classic.
# Values: n -> (n1, n2, stage-1 VPU factors).
_BALANCED = {
    512: (16, 32, (4, 4)),
    1024: (32, 32, (4, 8)),
    2048: (32, 64, (4, 8)),     # 0.158 vs classic 0.167 (probe_r28,
                                # radix-2^2 chains tipped the tie)
    4096: (256, 16, (4, 8, 8)),  # 0.621 vs (64,64)+(4,8,2) 0.633 and
                                 # (128,32)+(4,8,4) 0.639 — confirmed 3x
                                 # interleaved through production routing
                                 # (probe_r33 + scripts/vcheck_r35.py)
    8192: (256, 32, (4, 8, 8)),   # 0.338; (128,64)+(4,8,4) 0.342,
                                  # old (64,128)+(4,4,4) 0.489 (probe_r29/31)
    16384: (256, 64, (4, 8, 8)),  # 0.770 vs DIT chain 0.869 (probe_r31;
                                  # (128,128) chains still crash Mosaic)
}


def _kernel_rows_bal(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale, factors):
    """Balanced-split rows kernel: in-kernel transpose, VPU-chain stage 1
    over the major factor, realcat/Gauss stage 2 over the minor.  Output
    digit order [k2, k1] flattens to natural order (one transpose out)."""
    _rows_bal_math(xr_ref[:], xi_ref[:], or_ref, oi_ref, n=n, n1=n1,
                   n2=n2, sign=sign, scale=scale, factors=factors)


# Sizes where the cross-tile pipelined form (256-row block processed as
# two 128-row halves: half B's VPU chain overlaps half A's MXU dot in the
# Mosaic schedule) beats the plain 128-row kernel (probe_r45/r46, v5e):
# 512 0.055->0.044, 1024 0.082->0.074, 2048 0.158->0.149, 4096
# 0.621->0.611 ms.  8192 measured WORSE (0.338->0.402: the bigger block
# degrades Pallas's cross-step DMA pipelining once the per-half working
# set is large) and 16384 exceeds the compile service's VMEM budget.
# This is the harvest of the VERDICT r2 "cross-tile MXU/VPU software
# pipelining" family: distinct from the failed within-tile m2-half-split
# (whose half-K dots paid MXU fill penalties — these are full dots on
# independent row halves).
_PIPE2 = {512, 1024, 2048, 4096}


def _pick_pipe_tile(rows: int) -> int:
    """Row tile for the two-half pipelined kernels: 256 whenever at least
    one full 256-row block exists.  Ragged tails no longer force the tile
    down — `_edge_tiled` routes the sub-block remainder through its own
    one-tile call, so the main grid always runs the fastest block form."""
    return 256 if rows >= 256 else 128


def _edge_tiled(launch, ins, size, bt, in_axis=0, out_axis=0):
    """Ragged-extent pallas-call driver with EDGE-TILE-ONLY padding.

    Mosaic on this toolchain hard-faults the TPU worker on ragged edge
    grid blocks (probe_r57), and the round-3 whole-array pad + slice fix
    cost two extra HBM round trips on every non-aligned shape (VERDICT
    r3: the reference bench shape 2500x512 regressed 0.055 -> 0.095 ms).
    The reference gets ragged extents free with an in-kernel OOB guard
    (fft_wgpu src/kernel/fft.wgsl:20-22); the TPU equivalent is to make
    the pad cost scale with the EDGE TILE, not the array:

      * main call: the grid covers only the size // bt FULL blocks,
        reading straight from the unpadded input and writing the covered
        prefix of a full-size output (the tail stays unwritten);
      * tail call: the < bt ragged rows are sliced out (tile-aligned
        offset -> a copy of ~one block), zero-padded to whole 128-row
        blocks, run through the same kernel family at tile 128, and
        merged with a dynamic_update_slice XLA performs in place.

    `launch(ins, out_extent, nblocks, tile, start=0)` must run the
    underlying pallas_call with `nblocks` grid steps of `tile`-sized blocks
    over the `in_axis` extent of each array in `ins`, allocate outputs
    whose `out_axis` extent is `out_extent`, and return a TUPLE of outputs.
    `start` is the GLOBAL `in_axis` index of the call's first element
    (main call 0, tail call size//bt*bt) — kernels whose math depends on
    the global row index (the outer four-step twiddle in
    _fft_rows_t_core) must use it rather than restarting at zero.
    """
    g, tail = divmod(size, bt)
    if tail == 0:
        return launch(ins, size, g, bt)
    tt = _round_up(tail, 128)
    outs = launch(ins, size, g, bt) if g else None

    def _tail_in(a):
        sl = [slice(None)] * a.ndim
        sl[in_axis] = slice(g * bt, size)
        pad = [(0, 0)] * a.ndim
        pad[in_axis] = (0, tt - tail)
        return jnp.pad(a[tuple(sl)], pad)

    tail_outs = launch(tuple(_tail_in(a) for a in ins), tt, tt // 128, 128,
                       start=g * bt)

    def _tail_cut(t):
        sl = [slice(None)] * t.ndim
        sl[out_axis] = slice(0, tail)
        return t[tuple(sl)]

    if g == 0:
        return tuple(_tail_cut(t) for t in tail_outs)
    merged = []
    for o, t in zip(outs, tail_outs):
        start = [0] * o.ndim
        start[out_axis] = g * bt
        merged.append(
            jax.lax.dynamic_update_slice(o, _tail_cut(t), tuple(start)))
    return tuple(merged)


def _kernel_rows_bal_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2,
                          sign, scale, factors):
    """Two 128-row halves per grid step, ordered chainA, dotA, chainB,
    dotB — independent halves let the scheduler hide half B's VPU chain
    under half A's full-rate realcat dot (and vice versa for the
    output-side transposes)."""
    bt = xr_ref.shape[0]
    h = bt // 2
    twr, twi = _gen_twiddle(n1, n2, n, sign)
    if 2 * n2 <= 128:
        wr, wi = _gen_dft(n2, n2, n2, sign, scale)
        wbig = jnp.concatenate(
            [jnp.concatenate([wr, -wi], axis=1),
             jnp.concatenate([wi, wr], axis=1)], axis=0)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)

    for p in range(2):
        ar = xr_ref[p * h:(p + 1) * h, :].T.reshape(n1, n2, h)
        ai = xi_ref[p * h:(p + 1) * h, :].T.reshape(n1, n2, h)
        br, bi = _vpu_dft_leading(ar, ai, n1, sign, factors)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        if 2 * n2 <= 128:
            xcat = jnp.concatenate([cr, ci], axis=1)
            res = jax.lax.dot_general(
                wbig, xcat, ((((1,), (1,))), ((), ())),
                precision=_MM_PREC, preferred_element_type=jnp.float32)
            dr, di = res[:n2], res[n2:]
        else:
            dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                           ((1,), (1,)))
        or_ref[p * h:(p + 1) * h, :] = dr.reshape(n, h).T
        oi_ref[p * h:(p + 1) * h, :] = di.reshape(n, h).T


def _kernel_rows_bal_filt(xr_ref, xi_ref, hr_ref, hi_ref, or_ref, oi_ref,
                          *, n, n1, n2, sign, scale, factors):
    """Balanced rows kernel with a FUSED input filter multiply (the
    cuFFT load-callback analogue): x <- x * h elementwise on the
    VMEM-resident tile before the transform — zero extra HBM traffic."""
    hr = hr_ref[0]
    hi = hi_ref[0]
    xr = xr_ref[:]
    xi = xi_ref[:]
    _rows_bal_math(xr * hr - xi * hi, xr * hi + xi * hr, or_ref, oi_ref,
                   n=n, n1=n1, n2=n2, sign=sign, scale=scale,
                   factors=factors)


def _cdot_realcat_cut(n1, sign, xr, xi, cat_axis, dims, scale, kcut):
    """`_cdot_realcat` with an OUTPUT-ROW cut: only DFT bins k < kcut are
    produced (W rows sliced at trace time — the narrow-store Bluestein
    kernel needs just the first n_out of the m-point spectrum, so the
    stage-2 dot shrinks by the same factor)."""
    wr, wi = _gen_dft(n1, n1, n1, sign, scale)
    wr = wr[:kcut]
    wi = wi[:kcut]
    wbig = jnp.concatenate(
        [jnp.concatenate([wr, -wi], axis=1),
         jnp.concatenate([wi, wr], axis=1)], axis=0)
    xcat = jnp.concatenate([xr, xi], axis=cat_axis)
    res = _dot_prec(wbig, xcat, dims)
    return res[:kcut], res[kcut:]


def _kernel_rows_bal_filt_pad(xr_ref, xi_ref, hr_ref, hi_ref, or_ref,
                              oi_ref, *, n, n1, n2, sign, scale, factors,
                              n_in):
    """Bluestein FORWARD kernel: FFT_n(zero_pad(h .* x)) with the chirp
    multiply AND the n_in -> n zero-pad both fused into the load stage.
    The composed form paid two extra HBM round trips (chirp multiply +
    jnp.pad) over FOUR-times-n_in data; here the pad is an in-kernel lane
    concat (measured free — PERFORMANCE.md round-2b) on the VMEM tile.
    Reference anchor: chirp-z has no reference analogue; the fusion
    mirrors the fused last-stage epilogue idea (fft_wgpu
    src/kernel/ifft.wgsl:65-74)."""
    hr = hr_ref[0]
    hi = hi_ref[0]
    xr = xr_ref[:]
    xi = xi_ref[:]
    pr = xr * hr - xi * hi
    pi = xr * hi + xi * hr
    z = jnp.zeros((xr.shape[0], n - n_in), jnp.float32)
    _rows_bal_math(jnp.concatenate([pr, z], axis=1),
                   jnp.concatenate([pi, z], axis=1),
                   or_ref, oi_ref, n=n, n1=n1, n2=n2, sign=sign,
                   scale=scale, factors=factors)


def _kernel_rows_bal_filt_narrow(xr_ref, xi_ref, hr_ref, hi_ref, gr_ref,
                                 gi_ref, or_ref, oi_ref, *, n, n1, n2,
                                 sign, scale, factors, n_out):
    """Bluestein INVERSE kernel: g .* FFT_n(h .* x)[..., :n_out] with the
    filter-spectrum multiply fused into the load stage, and the output
    slice + post-chirp multiply fused into the store stage.  Only the
    first n_out bins are stored, so stage 2's dot is CUT to the
    ceil(n_out/n1) contributing k2 rows — both HBM write traffic and MXU
    work shrink by ~n/n_out."""
    hr = hr_ref[0]
    hi = hi_ref[0]
    xr = xr_ref[:]
    xi = xi_ref[:]
    pr = xr * hr - xi * hi
    pi = xr * hi + xi * hr
    bt = pr.shape[0]
    ar = pr.T.reshape(n1, n2, bt)
    ai = pi.T.reshape(n1, n2, bt)
    br, bi = _vpu_dft_leading(ar, ai, n1, sign, factors)
    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    # flat bin index is k2*n1 + k1: bins < n_out need k2 < ceil(n_out/n1)
    k2c = -(-n_out // n1)
    if 2 * n2 <= 128:
        dr, di = _cdot_realcat_cut(n2, sign, cr, ci, 1, ((1,), (1,)),
                                   scale, k2c)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r[:k2c], w2r[:k2c] + w2i[:k2c],
                       w2i[:k2c] - w2r[:k2c], cr, ci, ((1,), (1,)))
    tr = dr.reshape(k2c * n1, bt)[:n_out].T  # [bt, n_out]
    ti = di.reshape(k2c * n1, bt)[:n_out].T
    gr = gr_ref[0]
    gi = gi_ref[0]
    or_ref[:] = tr * gr - ti * gi
    oi_ref[:] = tr * gi + ti * gr


def _rows_bal_vals(xr2, xi2, *, n, n1, n2, sign, scale, factors):
    """Balanced-split rows math returning the PRE-transpose full
    spectrum [n, bt] — the single source of truth shared by the
    store-writing kernels here and the fused segment-spectrum kernels
    (ops/pallas_welch.py), so schedule/twiddle fixes cannot diverge."""
    bt = xr2.shape[0]
    ar = xr2.T.reshape(n1, n2, bt)
    ai = xi2.T.reshape(n1, n2, bt)

    br, bi = _vpu_dft_leading(ar, ai, n1, sign, factors)

    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]

    # stage 2: contract m2 (dim 1) -> [k2, k1, bt]
    if 2 * n2 <= 128:
        dr, di = _cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)), scale)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    return dr.reshape(n, bt), di.reshape(n, bt)


def _rows_bal_math(xr2, xi2, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                   factors):
    dr, di = _rows_bal_vals(xr2, xi2, n=n, n1=n1, n2=n2, sign=sign,
                            scale=scale, factors=factors)
    or_ref[:] = dr.T
    oi_ref[:] = di.T


def _kernel(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale):
    _rows_classic_math(xr_ref[:], xi_ref[:], or_ref, oi_ref, n=n, n1=n1,
                       n2=n2, sign=sign, scale=scale)


def _kernel_filt(xr_ref, xi_ref, hr_ref, hi_ref, or_ref, oi_ref, *, n,
                 n1, n2, sign, scale):
    """Classic rows kernel with a fused input filter multiply."""
    hr = hr_ref[0]
    hi = hi_ref[0]
    xr = xr_ref[:]
    xi = xi_ref[:]
    _rows_classic_math(xr * hr - xi * hi, xr * hi + xi * hr, or_ref,
                       oi_ref, n=n, n1=n1, n2=n2, sign=sign, scale=scale)


def _rows_classic_math(xr2, xi2, or_ref, oi_ref, *, n, n1, n2, sign,
                       scale):
    bt = xr2.shape[0]

    # Row split n -> (n1, n2): lane-dim split, free.
    ar = xr2.reshape(bt, n1, n2)
    ai = xi2.reshape(bt, n1, n2)

    if n1 == 1:  # n == 128: single-stage DFT, no inter-factor twiddle
        cr = jnp.swapaxes(ar, 0, 1)
        ci = jnp.swapaxes(ai, 0, 1)
    else:
        # ---- stage 1 (+ fused corner turn): [k1, bt, n2] = W1 . A ----
        if n1 in _VPU_S1_FACTORS:
            # MXU-free: in-kernel transpose (~free) + VPU butterflies
            br, bi = _vpu_dft_leading(
                jnp.swapaxes(ar, 0, 1), jnp.swapaxes(ai, 0, 1),
                n1, sign, _VPU_S1_FACTORS[n1])
        elif 2 * n1 <= 128:
            br, bi = _cdot_realcat(n1, sign, ar, ai, 1, ((1,), (1,)))
        else:
            w1r, w1i = _gen_dft(n1, n1, n1, sign)
            br, bi = _cdot(w1r, w1r + w1i, w1i - w1r, ar, ai, ((1,), (1,)))

        # ---- inter-factor twiddle tw[k1, n2] over batch (VPU) ----
        twr, twi = _gen_twiddle(n1, n2, n, sign)
        twr = twr[:, None, :]
        twi = twi[:, None, :]
        cr = br * twr - bi * twi
        ci = br * twi + bi * twr

    # ---- stage 2 (+ fused corner turn): [k2, k1, bt] = W2 . C over m2 ----
    w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
    dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))

    # Natural order: flatten [k2, k1] is a sublane merge; one output
    # transpose puts rows back in the batch-major HBM layout.
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def _supported(n) -> bool:
    if n < FUSED_MIN_N or n > FUSED_MAX_N:
        return False
    if n & (n - 1):
        return False
    return n % 128 == 0 and n // 128 <= 128


# Row-kernel schedule: "dit" (transpose-in sublane DIT chain, 256 MACs/pt)
# or "classic" (lane-split two-factor, 512 MACs/pt; 768 at n=16384).
# Measured (probe_r5b): classic wins up to n=8192 (per-stage overheads beat
# the DIT MAC savings); DIT wins 1.12x at n=16384 where classic's MACs
# balloon.  None = pick per n.
ROW_SCHEDULE = None
_DIT_AUTO_MIN_N = 16384
# DIT needs a full transpose of the tile in VMEM: require n >= 1024 (below
# that the classic kernel is already at the copy floor).
_DIT_MIN_N = 1024


def _fft_batched_core(re, im, sign, scale=None, *, row_tile=None,
                      interpret=False, schedule=None):
    """Batched FFT over the last axis via the fused Pallas kernel.

    re/im: float32 [..., n] (leading dims flattened to a row batch).
    sign: -1 forward / +1 inverse; scale folded into the last stage.
    """
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")
    schedule = schedule or ROW_SCHEDULE
    if schedule is None:
        if n in _BALANCED:
            schedule = "balanced"
        else:
            schedule = "dit" if n >= _DIT_AUTO_MIN_N else "classic"
    if schedule == "balanced" and n not in _BALANCED:
        raise Unsupported(f"no balanced split for n={n}")
    use_dit = schedule == "dit" and n >= _DIT_MIN_N

    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im  # empty batch: nothing to transform
    re2 = re.reshape(rows, n)
    im2 = im.reshape(rows, n)

    # balanced tiles were measured at 128 rows (the in-kernel transpose
    # wants square-ish vreg blocks), except the _PIPE2 sizes which run
    # 256-row blocks as two software-pipelined halves; classic keeps its
    # per-n tile choice
    if schedule == "balanced":
        tile = _pick_pipe_tile(rows) if n in _PIPE2 else 128
    else:
        tile = row_tile or _row_tile(n)
    bt = min(row_tile or tile, _round_up(rows, 128))

    sc = float(scale) if scale is not None else 1.0
    if schedule == "balanced":
        n1, n2, s1_factors = _BALANCED[n]
    else:
        n1, n2 = _choose_split(n)

    def _kern_for(bt_):
        if schedule == "balanced":
            return functools.partial(
                _kernel_rows_bal_pipe if bt_ == 256 and n in _PIPE2
                else _kernel_rows_bal,
                n=n, n1=n1, n2=n2, sign=sign, scale=sc,
                factors=s1_factors)
        if use_dit:
            return functools.partial(_kernel_rows_dit, n=n, sign=sign,
                                     scale=sc, factors=_dit_schedule(n))
        return functools.partial(_kernel, n=n, n1=n1, n2=n2, sign=sign,
                                 scale=sc)

    flops_per_row = 8 * n * (n1 + n2) + 6 * n

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kern_for(bt_),
            grid=(nblocks,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * n * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                # The default scoped-vmem limit (16 MiB) is far below
                # physical VMEM; the 128-row tiles at large n need more
                # for the double-buffered IO blocks.
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (re2, im2), rows, bt)
    return out_r.reshape(*lead, n), out_i.reshape(*lead, n)


# --------------------------------------------------------------------- #
# Axis(-2) kernel: transform down the sublane axis, batch in lanes.
# --------------------------------------------------------------------- #

def _choose_split_sublane(n: int) -> tuple[int, int]:
    """Balanced split for the sublane-domain (axis -2) kernel.

    Unlike the row kernel (whose lane-split pins n2 = 128), both factors
    live on the sublane axis here, so the factorization is free: balanced
    factors minimize MACs/point (n1 + n2) and keep both stages in the
    single-dot real-matrix form (measured: (64,64) beats (32,128) by ~15%
    at n = 4096).
    """
    e = n.bit_length() - 1
    n1 = 1 << (e // 2)
    return n1, n // n1


def _ax0_supported(n: int) -> bool:
    """Axis(-2) kernel envelope: the pow2 fused range, or (round 4) any
    composite n with a balanced factorization — the transform axis lives
    on SUBLANES here, so neither n nor its factors need 128-multiples
    (sublane reshapes are free with the 128-lane minor)."""
    if _supported(n):
        return True
    return (512 <= n <= FUSED_MAX_N
            and _choose_general_split(n) is not None)


# Stage-1 VPU chains by major-factor size, shared by the balanced rows
# kernels and the axis(-2) kernel.  (4,4,4) measured best for 64
# (probe_r14: pure-add radix-4s beat (8,8)'s sqrt2 rotations).
_S1_CHAINS = {4: (4,), 8: (8,), 16: (4, 4), 32: (4, 8), 64: (4, 4, 4)}


# Lane tile for the axis(-2) kernel (probe_r43): wider tiles amortize
# per-step overheads when n is small and the lane extent is huge (3-D
# axis passes, four-step stage 1).  n -> tile; anything absent uses 128.
# Measured (v5e, probe_r43): n=256 wins at lt=512 (0.676 -> 0.582 ms on
# a 65536-lane extent); n in {512, 1024, 4096} all prefer 128 — the win
# only exists where the sublane chain is short enough that per-grid-step
# overheads dominate.
_AX0_LANE_TILES: dict = {256: 512}


# Sizes where the lane-pipelined two-half ax0 form (see _kernel_ax0_pipe)
# beats both the plain 128-lane kernel and the wide-tile pins above
# (probe_r54, v5e, bit-exact): n=512 -6.6%, n=256 -5.1% (vs its lt=512
# pin), n=128 -27% (6.949 -> 5.065 ms on 16384 lanes).  n >= 1024 ties
# or loses (bigger blocks degrade cross-step DMA pipelining, the same
# lesson as pipe2 at 8192).
_PIPE_AX0 = {128, 256, 512}


def _ax0_lane_tile(n: int, m: int) -> int:
    lt = _AX0_LANE_TILES.get(n, 128)
    # shrink until the tile divides the (padded) lane extent and the
    # block fits comfortably in VMEM alongside its working copies
    while lt > 128 and (m % lt or n * lt > (1 << 21)):
        lt //= 2
    return max(lt, 128)


def _ax0_tile_math(ar, ai, *, n, n1, n2, sign, scale):
    """Sublane-axis FFT math on one [n1, n2, L] tile pair; returns the
    transformed ([n, L], [n, L]) planes.  Shared by the plain ax0 kernel
    and its lane-pipelined two-half variant."""
    lt = ar.shape[-1]
    if n1 == 1:  # single-stage DFT
        cr, ci = ar, ai
    else:
        # stage 1: contract m1 (dim 0) -> [k1, n2, b]; MXU-free VPU
        # butterfly chains for small major factors (same win as the row
        # kernels: the under-filled stage-1 dot is pure overhead)
        if n1 in _S1_CHAINS:
            br, bi = _vpu_dft_leading(ar, ai, n1, sign, _S1_CHAINS[n1])
        elif 2 * n1 <= 128:
            br, bi = _cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
        else:
            w1r, w1i = _gen_dft(n1, n1, n1, sign)
            br, bi = _cdot(w1r, w1r + w1i, w1i - w1r, ar, ai, ((1,), (0,)))

        # twiddle tw[k1, n2] over the lane (batch) axis
        twr, twi = _gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]

    # stage 2: contract m2 (dim 1) -> [k2, k1, b]; sublane-merge to [n, b]
    if 2 * n2 <= 128 and scale == 1.0:
        dr, di = _cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        if 2 * n2 <= 128:
            # realcat with folded scale: build the scaled big matrix inline
            wbig = jnp.concatenate(
                [jnp.concatenate([w2r, -w2i], axis=1),
                 jnp.concatenate([w2i, w2r], axis=1)], axis=0)
            xcat = jnp.concatenate([cr, ci], axis=1)
            res = jax.lax.dot_general(
                wbig, xcat, ((((1,), (1,))), ((), ())), precision=_MM_PREC,
                preferred_element_type=jnp.float32)
            dr, di = res[:n2], res[n2:]
        else:
            dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    return dr.reshape(n, lt), di.reshape(n, lt)


def _kernel_ax0(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                lt=128):
    """Columns-FFT tile: block [1, n, lt] transforms each of the lt lane
    columns along the sublane axis (lt a multiple of 128; wider tiles
    amortize per-step overheads when n is small — see _AX0_LANE_TILES).

    With the transform axis in sublanes, every four-step reindexing is a
    sublane split/merge (always supported) and the stage results come out
    already corner-turned — this kernel has NO transposes at all, which is
    why the planner prefers axis -2 transforms wherever layout allows
    (ND row-column passes, four-step stage 1).
    """
    dr, di = _ax0_tile_math(
        xr_ref[0].reshape(n1, n2, lt), xi_ref[0].reshape(n1, n2, lt),
        n=n, n1=n1, n2=n2, sign=sign, scale=scale)
    or_ref[0] = dr
    oi_ref[0] = di


def _kernel_ax0_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale):
    """Lane-pipelined ax0: a (1, n, 256) block processed as two
    independent 128-lane halves in one body, so half B's VPU chain
    overlaps half A's MXU dot (probe_r54 — the pipe2 structure on the
    lane axis).  Wins only where the chain dominates a small block:
    n=512 4.350 -> 4.062 ms on the 512^3 pass, n=256 4.635 -> 4.400 (vs
    the lt=512 pin); n=1024 ties and n=4096 LOSES (0.592 -> 0.617 — the
    bigger block degrades cross-step DMA pipelining, the same lesson as
    pipe2 at 8192)."""
    for p in range(2):
        sl = slice(p * 128, (p + 1) * 128)
        dr, di = _ax0_tile_math(
            xr_ref[0][:, sl].reshape(n1, n2, 128),
            xi_ref[0][:, sl].reshape(n1, n2, 128),
            n=n, n1=n1, n2=n2, sign=sign, scale=scale)
        or_ref[0, :, sl] = dr
        oi_ref[0, :, sl] = di


def _fft_axis0_core(re, im, sign, scale=None, *, interpret=False):
    """Batched FFT along axis -2 of [..., n, m] via the transpose-free
    sublane-domain kernel (the lane axis m carries the batch).

    m is padded to a multiple of 128 lanes; leading dims map to the grid.

    Round 4: composite non-pow2 n is supported too — the transform axis
    lives on sublanes, where reshapes need no 128-multiples, so any
    balanced factorization n = n1*n2 compiles (non-pow2 ND transforms
    get a transpose-free interior-axis pass this way).
    """
    n = re.shape[-2]
    if not _ax0_supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")

    lead = re.shape[:-2]
    m = re.shape[-1]
    b = int(np.prod(lead)) if lead else 1
    re3 = re.reshape(b, n, m)
    im3 = im.reshape(b, n, m)
    if n & (n - 1):
        n1, n2 = _choose_general_split(n)
    else:
        n1, n2 = _choose_split_sublane(n)
    sc = float(scale) if scale is not None else 1.0
    # Lane tile for the MAIN grid (ragged lane tails ride their own
    # one-tile `_edge_tiled` call, so divisibility no longer constrains
    # the choice): pipe form first where it measured fastest (probe_r54),
    # else the wide-tile pins shrunk to fit the extent / VMEM.
    if n in _PIPE_AX0 and m >= 256:
        lt = 256  # two software-pipelined 128-lane halves per step
    else:
        lt = _AX0_LANE_TILES.get(n, 128)
        while lt > 128 and (lt > m or n * lt > (1 << 21)):
            lt //= 2
        lt = max(lt, 128)

    def _kern_for(lt_):
        if lt_ == 256 and n in _PIPE_AX0:
            return functools.partial(
                _kernel_ax0_pipe, n=n, n1=n1, n2=n2, sign=sign, scale=sc)
        return functools.partial(
            _kernel_ax0, n=n, n1=n1, n2=n2, sign=sign, scale=sc, lt=lt_)

    flops_per_col = 8 * n * (n1 + n2) + 6 * n

    def _launch(ins, out_m, nblocks, lt_, start=0):
        spec = pl.BlockSpec((1, n, lt_), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kern_for(lt_),
            grid=(b, nblocks),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, out_m), jnp.float32),
                jax.ShapeDtypeStruct((b, n, out_m), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops_per_col * b * nblocks * lt_,
                bytes_accessed=4 * b * n * nblocks * lt_ * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (re3, im3), m, lt,
                               in_axis=2, out_axis=2)
    return out_r.reshape(*lead, n, m), out_i.reshape(*lead, n, m)


# --------------------------------------------------------------------- #
# Axis(-3) kernel: transform down the LEADING axis of [.., n, Y, Z]
# blocks read straight from the rank-3 tiled layout — no relayout.
# --------------------------------------------------------------------- #
#
# Why it exists (probe_r48): transforming a leading axis used to flatten
# the trailing dims ([X, Y, Z] -> [X, Y*Z]) for the axis(-2) kernel, but
# merging into the MINOR dim changes the (8,128) tiling — a physical XLA
# relayout costing a full extra HBM round trip (512^3 leading pass:
# 12.4 ms, of which ~7.7 was the relayout).  This kernel reads
# (n, st, 128) blocks directly (contiguous (st,128) tiles at stride
# Y*Z), runs the stage-1 chain on rank-4 state (the bigfft-proven form),
# and applies the inter-factor twiddle on a merged [n1, n2*st, 128] view
# against a 2-D iota table broadcast [:, :, None] — the one rank-4
# twiddle shape this Mosaic accepts ((.., 1, 1) unit-lane broadcasts
# crash it).  Measured: 512^3 leading pass 12.4 -> 4.22 ms, making
# fftn 512^3 a 13.7 ms transform (was 20.9).

_AX3_SUBTILE = 8

# Sizes where the sub-tile-pipelined ax3 form (two st-halves per
# (1, n, 16, 128) block — see _kernel_ax3_pipe) beats the plain st=8
# kernel (probe_r54, v5e, bit-exact): n=512 4.221 -> 3.841 ms (-9%),
# n=256 0.505 -> 0.454 (-10%).  st=32 as 2x16 loses at 512 (4.493).
_PIPE_AX3 = {256, 512}


def _ax3_tile_math(ar, ai, *, n, n1, n2, sign, scale, st, lt):
    """Leading-axis FFT math on one [n1, n2, st, lt] tile pair; returns
    the transformed ([n, st, lt], [n, st, lt]) planes.  Shared by the
    plain ax3 kernel and its sub-tile-pipelined two-half variant."""
    if n1 in _S1_CHAINS:
        br, bi = _vpu_dft_leading(ar, ai, n1, sign, _S1_CHAINS[n1])
    elif 2 * n1 <= 128:
        br, bi = _cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
    else:
        w1r, w1i = _gen_dft(n1, n1, n1, sign)
        br, bi = _cdot(w1r, w1r + w1i, w1i - w1r, ar, ai, ((1,), (0,)))
    # twiddle w_n^{k1 m2} on the merged view: the table value depends on
    # (k1, idx // st) only — 2-D iota, rank-3 trailing-unit broadcast
    k = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st), 0
                                 ).astype(jnp.float32)
    m = (jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st), 1) // st
         ).astype(jnp.float32)
    t = k * m
    r = t - n * jnp.floor(t / n)
    th = (sign * 2.0 * math.pi / n) * r
    twr = jnp.cos(th)[:, :, None]
    twi = jnp.sin(th)[:, :, None]
    b2r = br.reshape(n1, n2 * st, lt)
    b2i = bi.reshape(n1, n2 * st, lt)
    cr = (b2r * twr - b2i * twi).reshape(n1, n2, st, lt)
    ci = (b2r * twi + b2i * twr).reshape(n1, n2, st, lt)
    if 2 * n2 <= 128 and scale == 1.0:
        dr, di = _cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    return dr.reshape(n, st, lt), di.reshape(n, st, lt)


def _kernel_ax3(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                scale, st, lt):
    dr, di = _ax3_tile_math(
        xr_ref[0].reshape(n1, n2, st, lt),
        xi_ref[0].reshape(n1, n2, st, lt),
        n=n, n1=n1, n2=n2, sign=sign, scale=scale, st=st, lt=lt)
    or_ref[0] = dr
    oi_ref[0] = di


def _kernel_ax3_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale, st, lt):
    """Sub-tile-pipelined ax3: a (1, n, 2*st, 128) block processed as two
    independent st-halves in one body so one half's VPU chain overlaps
    the other's MXU dot (probe_r54: 512^3 pass 4.221 -> 3.841 ms with
    st=8 halves in a 16-wide block; splitting the EXISTING 8-wide block
    into 2x4 loses — the halves must stay DMA-efficient)."""
    for p in range(2):
        sl = slice(p * st, (p + 1) * st)
        dr, di = _ax3_tile_math(
            xr_ref[0][:, sl, :].reshape(n1, n2, st, lt),
            xi_ref[0][:, sl, :].reshape(n1, n2, st, lt),
            n=n, n1=n1, n2=n2, sign=sign, scale=scale, st=st, lt=lt)
        or_ref[0, :, sl, :] = dr
        oi_ref[0, :, sl, :] = di


def _fft_axis3_core(re, im, sign, scale=None, *, interpret=False):
    """Batched FFT along axis -3 of [..., n, Y, Z]: zero relayouts (the
    trailing (Y, Z) tiling is read as-is).  Y must be a multiple of the
    8-sublane tile and Z of 128 lanes; callers fall back to the
    flatten + axis(-2) route otherwise."""
    if re.ndim < 3:
        raise Unsupported("axis -3 kernel needs rank >= 3")
    n, Y, Z = re.shape[-3:]
    st = _AX3_SUBTILE
    if not _ax0_supported(n) or Y % st or Z % 128:
        raise Unsupported(f"axis -3 shape ({n},{Y},{Z}) unsupported")
    # block = n*st*128 f32 x2 arrays x2 in/out, double-buffered
    if n * st * 128 * 4 * 8 > 100 * 1024 * 1024:
        raise Unsupported(f"axis -3 block too large at n={n}")
    lead = re.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    if b == 0:
        return re, im
    re4 = re.reshape(b, n, Y, Z)
    im4 = im.reshape(b, n, Y, Z)
    if n & (n - 1):
        n1, n2 = _choose_general_split(n)
    else:
        n1, n2 = _choose_split_sublane(n)
    sc = float(scale) if scale is not None else 1.0
    if (n in _PIPE_AX3 and Y % (2 * st) == 0
            and n * 2 * st * 128 * 4 * 8 <= 100 * 1024 * 1024):
        # two software-pipelined st-halves per (1, n, 2*st, 128) block
        kern = functools.partial(
            _kernel_ax3_pipe, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
            st=st, lt=128)
        st = 2 * st
    else:
        kern = functools.partial(
            _kernel_ax3, n=n, n1=n1, n2=n2, sign=sign, scale=sc, st=st,
            lt=128)
    spec = pl.BlockSpec((1, n, st, 128), lambda i, j, l: (i, 0, j, l),
                        memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(b, Y // st, Z // 128),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, Y, Z), jnp.float32),
            jax.ShapeDtypeStruct((b, n, Y, Z), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=(8 * n * (n1 + n2) + 6 * n) * b * Y * Z,
            bytes_accessed=4 * b * n * Y * Z * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(re4, im4)
    return (out_r.reshape(*lead, n, Y, Z),
            out_i.reshape(*lead, n, Y, Z))


def fft_axis3_split(re, im, sign, scale=None, *, interpret=False):
    """Batched FFT along axis -3 of [..., n, Y, Z] with no relayouts.
    Differentiable both modes (sign-flipped adjoint)."""
    return _linear2(
        lambda a, b: _fft_axis3_core(a, b, sign, scale,
                                     interpret=interpret),
        lambda a, b: _fft_axis3_core(a, b, -sign, scale,
                                     interpret=interpret),
        re, im)


# --------------------------------------------------------------------- #
# Four-step companion: rows-FFT with fused outer twiddle and transposed
# block output (the two HBM-pass large-N path).
# --------------------------------------------------------------------- #
def _kernel_rows_t(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                   scale, bt, outer, row_off=0):
    """Like `_kernel` but:

    * optionally applies the OUTER four-step twiddle
      tw[k1, m2] = exp(sign*2pi*i*k1*m2/N) to the input in-register, where
      k1 is this block's global row index within the outer factor — fusing
      fourstep's separate twiddle pass into the kernel (one HBM round trip
      saved);
    * writes the output block TRANSPOSED ([n, bt] into an [*, n, R] array),
      so the four-step's final corner-turn flatten X[k1 + R*k2] = D[k1,k2]
      happens in the output BlockSpec instead of an extra HBM transpose
      (a second round trip saved).
    """
    ar = xr_ref[0]  # [bt, n]
    ai = xi_ref[0]

    if outer is not None:
        outer_n1, outer_n = outer
        i = pl.program_id(1)
        ar, ai = _outer_tw_mul_rows(ar, ai, row_off + i * bt, n, outer_n,
                                    sign)

    w1r, w1i = _gen_dft(n1, n1, n1, sign)
    itwr, itwi = _gen_twiddle(n1, n2, n, sign)
    w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)

    a3r = ar.reshape(bt, n1, n2)
    a3i = ai.reshape(bt, n1, n2)
    if n1 == 1:  # n == 128: single-stage DFT
        cr = jnp.swapaxes(a3r, 0, 1)
        ci = jnp.swapaxes(a3i, 0, 1)
    else:
        if 2 * n1 <= 128:
            br, bi = _cdot_realcat(n1, sign, a3r, a3i, 1, ((1,), (1,)))
        else:
            br, bi = _cdot(w1r, w1r + w1i, w1i - w1r, a3r, a3i, ((1,), (1,)))
        cr = br * itwr[:, None, :] - bi * itwi[:, None, :]
        ci = br * itwi[:, None, :] + bi * itwr[:, None, :]
    dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))

    or_ref[0] = dr.reshape(n, bt)  # already [k, row] — no transpose
    oi_ref[0] = di.reshape(n, bt)


def _kernel_rows_t_bal(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                       scale, bt, outer, factors, row_off=0):
    """Balanced-split variant of `_kernel_rows_t`: transpose-in, VPU-chain
    stage 1, realcat stage 2.  The transposed-output contract means the
    balanced design's natural [n, bt] result order needs NO output
    transpose at all here; the outer four-step twiddle is applied in the
    transposed layout (rows on lanes, m on sublanes)."""
    ar = xr_ref[0].T  # [n, bt]
    ai = xi_ref[0].T

    if outer is not None:
        _, outer_n = outer
        i = pl.program_id(1)
        ar, ai = _outer_tw_mul_rows_t(ar, ai, row_off + i * bt, n, outer_n,
                                      sign)

    ar = ar.reshape(n1, n2, bt)
    ai = ai.reshape(n1, n2, bt)
    br, bi = _vpu_dft_leading(ar, ai, n1, sign, factors)
    itwr, itwi = _gen_twiddle(n1, n2, n, sign)
    cr = br * itwr[:, :, None] - bi * itwi[:, :, None]
    ci = br * itwi[:, :, None] + bi * itwr[:, :, None]
    if 2 * n2 <= 128:
        dr, di = _cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)), scale)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[0] = dr.reshape(n, bt)
    oi_ref[0] = di.reshape(n, bt)


def _fft_rows_t_core(re, im, sign, scale=None, *, outer=None,
                     interpret=False):
    """FFT each length-n row of [..., R, n]; returns [..., n, R] (the
    transposed result), optionally pre-multiplying row r by the outer
    four-step twiddle exp(sign*2pi*i*r*m/outer_n).

    This is the second pass of the two-HBM-pass four-step (see
    ops/fourstep.py).
    """
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")
    R = re.shape[-2]
    lead = re.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    re3 = re.reshape(b, R, n)
    im3 = im.reshape(b, R, n)

    bt = 128
    sc = float(scale) if scale is not None else 1.0
    if n in _BALANCED:
        n1, n2, s1_factors = _BALANCED[n]
    else:
        n1, n2 = _choose_split(n)

    def _kern_for(bt_, row_off):
        # row_off: global row index of this call's first row (the outer
        # four-step twiddle depends on the GLOBAL row, so the ragged-tail
        # call must not restart it at zero)
        if n in _BALANCED:
            return functools.partial(
                _kernel_rows_t_bal, n=n, n1=n1, n2=n2, sign=sign,
                scale=sc, bt=bt_, outer=outer, factors=s1_factors,
                row_off=row_off)
        return functools.partial(
            _kernel_rows_t, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
            bt=bt_, outer=outer, row_off=row_off)

    def _launch(ins, out_R, nblocks, bt_, start=0):
        # `start` (from _edge_tiled) is the global row index of this
        # call's first row: the outer four-step twiddle depends on the
        # GLOBAL row, so the ragged-tail call must not restart it at zero
        in_spec = pl.BlockSpec((1, bt_, n), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, n, bt_), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        kern = _kern_for(bt_, start)
        return pl.pallas_call(
            kern,
            grid=(b, nblocks),
            in_specs=[in_spec, in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((b, n, out_R), jnp.float32),
                jax.ShapeDtypeStruct((b, n, out_R), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(8 * n * (n1 + n2) + 6 * n) * b * nblocks * bt_,
                bytes_accessed=4 * b * nblocks * bt_ * n * 4,
                transcendentals=2 * (n1 * n1 + n1 * n2 + n2 * n2),
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (re3, im3), R, bt,
                               in_axis=1, out_axis=2)
    return out_r.reshape(*lead, n, R), out_i.reshape(*lead, n, R)


def _stage_dft_real(xr, f: int, dim: int, sign: int):
    """First VPU butterfly stage specialized for REAL input: the imag
    accumulator only receives the twiddles' sine terms, halving the adds
    (used by the balanced R2C kernel; k=0's imag row is exactly zero)."""
    idx = (slice(None),) * dim
    if f == 4:
        # real radix-2^2: 6 real adds; X0/X2 are real, X3 = conj(X1)
        x0, x1, x2, x3 = (xr[idx + (j,)] for j in range(4))
        t0, t1 = x0 + x2, x0 - x2
        t2, t3 = x1 + x3, x1 - x3
        z = jnp.zeros_like(t0)
        im1 = -t3 if sign < 0 else t3
        return _stack0([t0 + t2, t1, t0 - t2, t1],
                       [z, im1, z, -im1])
    outs_r, outs_i = [], []
    for k in range(f):
        ar = ai = None
        for j in range(f):
            c = math.cos(sign * 2.0 * math.pi * k * j / f)
            s = math.sin(sign * 2.0 * math.pi * k * j / f)
            vr = xr[idx + (j,)]
            tr = None if abs(c) < 1e-12 else (vr if c == 1.0 else c * vr)
            ti = None if abs(s) < 1e-12 else s * vr
            if tr is not None:
                ar = tr if ar is None else ar + tr
            if ti is not None:
                ai = ti if ai is None else ai + ti
        if ai is None:
            ai = jnp.zeros_like(ar)
        outs_r.append(ar[None])
        outs_i.append(ai[None])
    return jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0)


def _vpu_dft_leading_real(xr, S, sign, factors):
    """`_vpu_dft_leading` for REAL input [S, ...]: the first stage runs
    the real-specialized butterflies, later stages are complex as usual."""
    if len(factors) == 1:
        return _stage_dft_real(xr, S, 0, sign)
    rest = xr.shape[1:]
    f = factors[0]
    B = S // f
    block = S
    xr = xr.reshape(f, B, *rest)
    br, bi = _stage_dft_real(xr, f, 0, sign)  # [k_f, B, rest]
    cr, ci = _scalar_tw_first(br, bi, f, B, block, sign)
    return _vpu_chain_tail(cr.reshape(S, *rest), ci.reshape(S, *rest),
                           S, sign, factors[1:], f)


def _vpu_chain_tail(xr, xi, S, sign, factors, K0):
    """Continue a VPU DIT chain from accumulated-digit state K=K0."""
    rest = xr.shape[1:]
    K, B = K0, S // K0
    for f in factors:
        B //= f
        block = f * B
        if B > 1:
            xr = xr.reshape(K, f, B, *rest)
            xi = xi.reshape(K, f, B, *rest)
            br, bi = _stage_dft(xr, xi, f, 1, sign, 1.0)
            rows_r, rows_i = [], []
            for k in range(f):
                cols_r, cols_i = [], []
                for m in range(B):
                    vr, vi = br[k, :, m], bi[k, :, m]
                    if k * m % block:
                        c = math.cos(sign * 2.0 * math.pi * k * m / block)
                        s = math.sin(sign * 2.0 * math.pi * k * m / block)
                        vr, vi = c * vr - s * vi, c * vi + s * vr
                    cols_r.append(vr[:, None])
                    cols_i.append(vi[:, None])
                rows_r.append(jnp.concatenate(cols_r, 1)[None])
                rows_i.append(jnp.concatenate(cols_i, 1)[None])
            br = jnp.concatenate(rows_r, 0)
            bi = jnp.concatenate(rows_i, 0)
        else:
            xr = xr.reshape(K, f, *rest)
            xi = xi.reshape(K, f, *rest)
            br, bi = _stage_dft(xr, xi, f, 1, sign, 1.0)
        K *= f
        xr = br.reshape(K * B, *rest)
        xi = bi.reshape(K * B, *rest)
    return xr, xi


# --------------------------------------------------------------------- #
# Single-pass R2C rows kernel.
# --------------------------------------------------------------------- #
def _r2c_store(or_ref, oi_ref, dr, di, mp, mp_out, bt, sl=slice(None)):
    """Write the pre-transpose half-spectrum rows [rows>=mp, bt] into a
    [bt, mp_out] output block.  mp_out > mp is the PADDED serving form
    (probe_r45: the ragged n/2+1 minor breaks HBM stride alignment for
    every row — R2C 4096 drops 0.657 -> 0.452 ms with a 128-multiple
    block); pad columns are explicitly ZEROED so downstream consumers
    (and the AD transpose) can treat the padded spectrum as exact.
    `sl` restricts the write to a row slice (the pipe kernels store one
    half per call; bt is then the half height)."""
    if dr.shape[0] < mp_out:
        z = jnp.zeros((mp_out - dr.shape[0], bt), jnp.float32)
        dr = jnp.concatenate([dr, z], axis=0)
        di = jnp.concatenate([di, z], axis=0)
    else:
        dr = dr[:mp_out]
        di = di[:mp_out]
    if mp_out > mp:
        keep = (jax.lax.broadcasted_iota(jnp.int32, (mp_out, bt), 0)
                < mp).astype(jnp.float32)
        dr = dr * keep
        di = di * keep
    or_ref[sl, :] = dr.T
    oi_ref[sl, :] = di.T


def _kernel_r2c(xr_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale, mp,
                mp_out):
    """Real-input rows FFT writing only the half spectrum.

    The XLA-level packed R2C (ops/rfft.py) pays ~5 HBM passes in
    de-interleave / flip / unpack relayouts (measured 9.7% of the R2C
    roofline); here the real row is read ONCE, the zero-imag C2C runs in
    VMEM, and only bins k <= n/2 are written — the natural-order flat
    index equals k, so the half-spectrum slice is a plain sublane slice
    of the pre-transpose [n, bt] result."""
    bt = xr_ref.shape[0]
    ar = xr_ref[:].reshape(bt, n1, n2)

    # stage 1 on REAL input: B = W1 . x needs only 2 real half-matmuls,
    # done as ONE stacked dot [[W1r],[W1i]] [2*n1, n1] . x — half the MACs
    # of the complex realcat form.
    w1r, w1i = _gen_dft(n1, n1, n1, sign)
    wcat = jnp.concatenate([w1r, w1i], axis=0)
    res = jax.lax.dot_general(
        wcat, ar, ((((1,), (1,))), ((), ())), precision=_MM_PREC,
        preferred_element_type=jnp.float32)
    br, bi = res[:n1], res[n1:]

    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, None, :] - bi * twi[:, None, :]
    ci = br * twi[:, None, :] + bi * twr[:, None, :]

    # stage 2 computes only the output rows k2 <= (mp-1)//n1 — conjugate
    # symmetry makes bins k > n/2 redundant, so the DFT matrix is cut to
    # k2_max+1 (padded to a sublane multiple) rows: ~9/16 of the MACs.
    k2_rows = _round_up(mp // n1 + 1, 8)
    w2r, w2i = _gen_dft(k2_rows, n2, n2, sign, scale)
    dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (2,)))

    _r2c_store(or_ref, oi_ref, dr.reshape(k2_rows * n1, bt),
               di.reshape(k2_rows * n1, bt), mp, mp_out, bt)


def _r2c_bal_vals(frames, *, n, n1, n2, sign, scale, mp, factors):
    """Balanced-split R2C math: real [bt, n] -> PRE-transpose half
    spectrum pair [k2_rows*n1, bt] (rows >= mp; caller cuts/stores).
    REAL-specialized VPU chain stage 1 (no MXU, half the butterfly
    adds), stage 2 as one realcat dot cut to the half-spectrum output
    rows k2 <= mp//n1.  Shared with ops/pallas_welch.py."""
    bt = frames.shape[0]
    ar = frames.T.reshape(n1, n2, bt)

    br, bi = _vpu_dft_leading_real(ar, n1, sign, factors)

    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]

    k2_rows = _round_up(mp // n1 + 1, 8)
    w2r, w2i = _gen_dft(k2_rows, n2, n2, sign, scale)
    wbig = jnp.concatenate(
        [jnp.concatenate([w2r, -w2i], axis=1),
         jnp.concatenate([w2i, w2r], axis=1)], axis=0)
    xcat = jnp.concatenate([cr, ci], axis=1)
    res = _dot_prec(wbig, xcat, ((1,), (1,)))
    return (res[:k2_rows].reshape(k2_rows * n1, bt),
            res[k2_rows:].reshape(k2_rows * n1, bt))


def _kernel_r2c_bal(xr_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale, mp,
                    mp_out, factors):
    """Balanced-split R2C rows kernel: _r2c_bal_vals + store."""
    dr, di = _r2c_bal_vals(xr_ref[:], n=n, n1=n1, n2=n2, sign=sign,
                           scale=scale, mp=mp, factors=factors)
    _r2c_store(or_ref, oi_ref, dr, di, mp, mp_out, xr_ref.shape[0])


# Sizes where the two-half pipelined R2C form (256-row block as two
# independent 128-row halves — the pipe2 structure on the balanced R2C
# kernel) beats the plain 128-row kernel (probe_r55, v5e, padded serving
# form): 512 0.067->0.054, 1024 0.123->0.112, 2048 0.247->0.235, 4096
# 0.451->0.441 ms, all bit-exact.  8192 measured WORSE (0.463->0.544 —
# the block-growth lesson of pipe2/_PIPE_AX0 again).
_PIPE_R2C = {512, 1024, 2048, 4096}


def _kernel_r2c_pipe(xr_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                     mp, mp_out, factors):
    """Two 128-row halves per grid step: half B's real VPU chain overlaps
    half A's half-spectrum realcat dot in the Mosaic schedule (the
    _kernel_rows_bal_pipe structure applied to _kernel_r2c_bal).  Each
    half is one _r2c_bal_vals call (the constant tables CSE across
    halves)."""
    bt = xr_ref.shape[0]
    h = bt // 2
    for p in range(2):
        sl = slice(p * h, (p + 1) * h)
        dr, di = _r2c_bal_vals(xr_ref[sl, :], n=n, n1=n1, n2=n2,
                               sign=sign, scale=scale, mp=mp,
                               factors=factors)
        _r2c_store(or_ref, oi_ref, dr, di, mp, mp_out, h, sl)


# R2C balanced-split routing: n -> (n1, n2, stage-1 VPU factors).  Only
# sizes where the balanced kernel measured faster than the classic lane
# split on v5e (probe_r19: 4096x4096 rows 0.871 -> 0.656 ms, 8192x2048
# 0.926 -> 0.829, 2048x4096 0.436 -> 0.356); others fall back to
# _kernel_r2c.  The real-specialized stage 1 halves the butterfly adds.
_BALANCED_R2C: dict = {
    512: (16, 32, (4, 4)),      # 0.115 -> 0.099 ms @4096 rows (probe_r22b)
    1024: (32, 32, (4, 8)),     # 0.218 -> 0.186
    2048: (64, 32, (4, 4, 4)),  # (128,16)+(4,8,4): 0.388 — keep (probe_r31)
    4096: (64, 64, (4, 4, 4)),  # (128,32)+(4,8,4): 0.693 — keep (probe_r31)
    8192: (128, 64, (4, 8, 4)),  # 0.698 vs (64,128)+(4,4,4) 0.813 (probe_r31)
    16384: (256, 64, (4, 8, 8)),  # 0.794 vs classic 0.954 and (128,128)
                                  # 0.935 (probe_r46 — the r2 VERDICT's
                                  # missing balanced 16384 entry)
}


def pad_bins(n: int) -> int:
    """Lane-aligned bin count of the PADDED half-spectrum serving form:
    round_up(n//2+1, 128).  Pad columns are exact zeros."""
    return _round_up(n // 2 + 1, 128)


def _rfft_rows_core(xr, scale=None, *, interpret=False, pad_out=False):
    """Batched R2C FFT over the last axis: real float32 [..., n] ->
    split complex [..., n//2+1], one HBM round trip (fused kernel
    envelope; callers fall back to the packed XLA path outside it).

    pad_out=True writes the PADDED serving form [..., pad_bins(n)]
    (zeros beyond bin n//2): the ragged n/2+1 minor misaligns every HBM
    row and measured 1.45x slower (probe_r45: 4096x4096 0.657 vs 0.452
    ms).  Round-trip pipelines keep the padded form end-to-end; the
    public numpy-parity API slices at the boundary."""
    n = xr.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")
    lead = xr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    m_out = n // 2 + 1
    mp_out = pad_bins(n) if pad_out else m_out
    if rows == 0:
        z = jnp.zeros((*lead, mp_out), jnp.float32)
        return z, z
    x2 = xr.reshape(rows, n)

    if n in _BALANCED_R2C:
        tile = _pick_pipe_tile(rows) if n in _PIPE_R2C else 128
    else:
        tile = _row_tile(n)
    bt = min(tile, _round_up(rows, 128))

    mp = m_out  # logical bins (the k2 output cut)
    sc = float(scale) if scale is not None else 1.0
    if n in _BALANCED_R2C:
        n1, n2, s1_factors = _BALANCED_R2C[n]
    else:
        n1, n2 = _choose_split(n)

    def _kern_for(bt_):
        if n in _BALANCED_R2C:
            return functools.partial(
                _kernel_r2c_pipe if bt_ == 256 and n in _PIPE_R2C
                else _kernel_r2c_bal,
                n=n, n1=n1, n2=n2, sign=-1, scale=sc, mp=mp,
                mp_out=mp_out, factors=s1_factors)
        return functools.partial(
            _kernel_r2c, n=n, n1=n1, n2=n2, sign=-1, scale=sc, mp=mp,
            mp_out=mp_out)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt_, mp_out), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            _kern_for(bt_),
            grid=(nblocks,),
            in_specs=[in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, mp_out), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, mp_out), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(8 * n * (n1 + n2) + 6 * n) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (n + 2 * mp_out),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (x2,), rows, bt)
    return out_r.reshape(*lead, mp_out), out_i.reshape(*lead, mp_out)


# --------------------------------------------------------------------- #
# Single-pass C2R rows kernel (flip-free half-spectrum contraction).
# --------------------------------------------------------------------- #
def _kernel_c2r(xr_ref, xi_ref, o_ref, *, n, Q, K2, nyq, scale):
    """C2R: [bt, K2*128] padded half spectrum -> real [bt, n].

    Mosaic has no lane-reverse (`rev` unimplemented) and minor-2
    interleaves crash the compiler, so the classic packed/hermitian-
    extend recipes are unusable in-kernel.  Instead contract the half
    spectrum directly:

        x[j] = 2*Re(S[j]) * scale,   S[j] = sum_{k=0..m} w_n^{+jk} X'[k]
        (X' = X with the DC/Nyquist real parts halved, which makes the
         2*Re fold exact — no correction terms)

    four-stepped over k = k1 + 128*k2 and j = jq + Q*j1 (Q = n/128):

        stage A: contract k2 (K2 = m/128+1 terms)  w_Q^{jq k2}   (small)
        twiddle: w_n^{+jq k1}
        stage B: contract k1, REAL PART ONLY: 2 full-rate [128,128] dots
        output [j1, jq] row-major == j: natural order, one transpose

    ~300 real MACs/point vs the 512 of a full C2C inverse, one HBM read
    of the half spectrum and one write of the real row.
    """
    bt = xr_ref.shape[0]
    m_k2 = nyq  # k2 index of the Nyquist bin (k1 == 0 there)
    xr3 = xr_ref[:].reshape(bt, K2, 128)
    xi3 = xi_ref[:].reshape(bt, K2, 128)

    # mask: DC/Nyquist imag parts are discarded (C2R semantics) and any
    # caller padding beyond the Nyquist bin is zeroed.
    k2i = jax.lax.broadcasted_iota(jnp.int32, (K2, 128), 0)
    k1i = jax.lax.broadcasted_iota(jnp.int32, (K2, 128), 1)
    valid = ((k2i < m_k2) | ((k2i == m_k2) & (k1i == 0))).astype(jnp.float32)
    ends = ((k1i == 0) & ((k2i == 0) | (k2i == m_k2))).astype(jnp.float32)
    # halving the DC/Nyquist real parts makes x[j] == 2*Re(S[j]) EXACT
    # (they would otherwise be double-counted by the 2*Re fold), so no
    # per-row correction terms are needed at all.
    xr3 = xr3 * (valid - 0.5 * ends)
    xi3 = xi3 * (valid - ends)

    # stage A: S_A[jq, bt, k1] = sum_k2 w_Q^{+jq k2} X[k1 + 128 k2]
    war, wai = _gen_dft(Q, K2, Q, +1)
    ar, ai = _cdot(war, war + wai, wai - war, xr3, xi3, ((1,), (1,)))

    # inter twiddle w_n^{+jq k1}
    twr, twi = _gen_dft(Q, 128, n, +1)
    cr = ar * twr[:, None, :] - ai * twi[:, None, :]
    ci = ar * twi[:, None, :] + ai * twr[:, None, :]

    # stage B, real part only, with the 2*scale factor folded in:
    # Re(W.c) = Wr.cr - Wi.ci  (two dots, no Gauss needed)
    wbr, wbi = _gen_dft(128, 128, 128, +1, 2.0 * scale)
    d = lambda w, x: jax.lax.dot_general(
        w, x, ((((1,), (2,))), ((), ())), precision=_MM_PREC,
        preferred_element_type=jnp.float32)
    s2 = d(wbr, cr) - d(wbi, ci)  # [j1, jq, bt]

    o_ref[:] = s2.reshape(n, bt).T


def _kernel_c2r_bal(xr_ref, xi_ref, o_ref, *, n, n1, n2, scale,
                    factors=None):
    """Balanced-split C2R rows kernel: the mirror of _kernel_r2c_bal.

    Mosaic has no `rev` anywhere (probe_r20: lowering rejects it even on
    sublanes), so the Hermitian extension is avoided entirely via the
    classic half-spectrum identity the flip-free kernel already uses
    (x[j] = 2*Re(sum_{k<=n/2} w^{+jk} X'[k]) with the DC/Nyquist real
    parts halved — an INPUT-side mask, the documented-safe pattern),
    here factorized over k = k1*n2 + k2, j = m2*n1 + m1:

        stage A: contract the STORED k1 rows (k1 <= n1/2) — one realcat
                 dot; the K-fill rule makes the half-height contraction
                 cost the same as K=128, so the cut is free
        twiddle: w_n^{+m1 k2}
        stage B: contract k2, REAL part only — one [n2, 2*n2] stacked dot
                 (half the MACs of a complex stage), 2*scale folded in

    Output digit order [m2, m1] flattens to natural j; one transpose out.
    Replaces _kernel_c2r where measured faster (see _BALANCED_C2R)."""
    dr = _c2r_bal_vals(xr_ref[:].T, xi_ref[:].T, n=n, n1=n1, n2=n2,
                       scale=scale, factors=factors)
    o_ref[:] = dr.T


def _c2r_bal_vals(ar, ai, *, n, n1, n2, scale, factors):
    """Balanced-split C2R math on TRANSPOSED [mp, bt] spectra -> real
    [n, bt] pre-transpose.  Single source of truth for the plain,
    pipelined and fused-product C2R kernels."""
    bt = ar.shape[1]
    h = n // 2
    rows_in = (n1 // 2 + 1) * n2  # stored k1 rows cover k = 0..h (+pad)

    # input-side mask: halve DC/Nyquist real parts (makes 2*Re exact),
    # discard their imaginary parts (C2R semantics), and ZERO any rows
    # beyond the Nyquist bin — the padded-spectrum serving form
    # guarantees zeros there, but self-masking keeps the kernel correct
    # for arbitrary pad contents (defense costs one fused multiply).
    ri = jax.lax.broadcasted_iota(jnp.int32, ar.shape, 0)
    ends = (ri == 0) | (ri == h)
    ar = ar * jnp.where(ri > h, 0.0,
                        jnp.where(ends, 0.5, 1.0)).astype(jnp.float32)
    ai = ai * ((ri > 0) & (ri < h)).astype(jnp.float32)

    xr = ar[:rows_in].reshape(n1 // 2 + 1, n2, bt)
    xi = ai[:rows_in].reshape(n1 // 2 + 1, n2, bt)

    # stage A: Y[m1, k2, bt] = sum_{k1<=n1/2} w_n1^{+m1 k1} X'[k1, k2, bt]
    if factors is not None:
        # VPU chain: zero-extend the stored k1 rows to the full n1 digit
        # (in-kernel concat is free; butterflies don't K-fill like dots)
        # and run the standard leading-axis chain at sign=+1.
        z = jnp.zeros((n1 - (n1 // 2 + 1), n2, bt), jnp.float32)
        yr, yi = _vpu_dft_leading(
            jnp.concatenate([xr, z], axis=0),
            jnp.concatenate([xi, z], axis=0), n1, +1, factors)
    else:
        war, wai = _gen_dft(n1, n1 // 2 + 1, n1, +1)
        wbig = jnp.concatenate(
            [jnp.concatenate([war, -wai], axis=1),
             jnp.concatenate([wai, war], axis=1)], axis=0)  # [2n1, n1+2]
        xcat = jnp.concatenate([xr, xi], axis=0)
        res = _dot_prec(wbig, xcat, ((1,), (0,)))  # [2n1, k2, bt]
        yr, yi = res[:n1], res[n1:]

    twr, twi = _gen_twiddle(n1, n2, n, +1)
    zr = yr * twr[:, :, None] - yi * twi[:, :, None]
    zi = yr * twi[:, :, None] + yi * twr[:, :, None]

    # stage B (real output): x[m2, m1, bt] = 2*scale * Re(W2 . z)
    wbr, wbi = _gen_dft(n2, n2, n2, +1, 2.0 * scale)
    wcat = jnp.concatenate([wbr, -wbi], axis=1)  # [n2, 2*n2]
    zcat = jnp.concatenate([zr, zi], axis=1)  # [n1, 2*n2, bt]
    out = _dot_prec(wcat, zcat, ((1,), (1,)))  # [m2, m1, bt]
    return out.reshape(n, bt)


def _kernel_c2r_bal_prod(ar_ref, ai_ref, br_ref, bi_ref, o_ref, *, n, n1,
                         n2, scale, factors=None, broadcast_b=False):
    """Fused product-C2R: real(irfft(A .* B)) with the complex spectrum
    product computed on the VMEM tiles at load — the spectrum-domain
    convolution epilogue (fftconvolve/oaconvolve) without the separate
    HBM multiply pass.  broadcast_b: B is one spectrum row shared by
    every A row (oaconvolve's kernel spectrum)."""
    ar, ai = ar_ref[:], ai_ref[:]
    if broadcast_b:
        br, bi = br_ref[0], bi_ref[0]
    else:
        br, bi = br_ref[:], bi_ref[:]
    pr = ar * br - ai * bi
    pi = ar * bi + ai * br
    dr = _c2r_bal_vals(pr.T, pi.T, n=n, n1=n1, n2=n2, scale=scale,
                       factors=factors)
    o_ref[:] = dr.T


# Sizes where the two-half pipelined C2R form beats the plain 128-row
# balanced kernel (probe_r55, v5e, padded-in serving form): 512
# 0.061->0.049, 1024 0.115->0.102, 2048 0.211->0.200, 4096 0.435->0.432
# ms, bit-exact.  8192 WORSE (0.467->0.530).  Requires a chain stage A
# (every _PIPE_C2R entry has factors).
_PIPE_C2R = {512, 1024, 2048, 4096}


def _kernel_c2r_pipe(xr_ref, xi_ref, o_ref, *, n, n1, n2, scale, factors):
    """Two 128-row halves per grid step: half B's zero-extended VPU chain
    (stage A) overlaps half A's real-output stacked dot (stage B) — the
    _kernel_rows_bal_pipe structure applied to _kernel_c2r_bal.  Each
    half is one _c2r_bal_vals call (constant tables CSE across halves)."""
    bt = xr_ref.shape[0]
    hh = bt // 2
    for p in range(2):
        sl = slice(p * hh, (p + 1) * hh)
        dr = _c2r_bal_vals(xr_ref[sl, :].T, xi_ref[sl, :].T, n=n, n1=n1,
                           n2=n2, scale=scale, factors=factors)
        o_ref[sl, :] = dr.T


# C2R balanced-split routing: n -> (n1, n2) with n1 the contracted input
# factor; filled only where measured faster than _kernel_c2r on v5e
# (probe_r20b: 4096x4096 rows 1.177 -> 0.885 ms, 8192x2048 1.387 -> 1.161,
# 2048x4096 0.641 -> 0.444).  Requires (n1/2+1)*n2 <= round_up(n/2+1, 128),
# i.e. n2 <= 128.
# (n1, n2) realcat stage A, or (n1, n2, factors) stage A as a
# zero-extended VPU chain — the chain beat the half-height realcat dot at
# EVERY size (probe_r31): 512 0.129 -> 0.097, 1024 0.237 -> 0.181,
# 2048 0.444 -> 0.325, 4096 0.886 -> 0.678, 8192 1.161 -> 0.688 ms.
_BALANCED_C2R: dict = {
    512: (16, 32, (4, 4)),
    1024: (32, 32, (4, 8)),
    2048: (32, 64, (4, 8)),
    4096: (64, 64, (4, 8, 2)),   # (4,4,4): 0.681; (128,32)+(4,8,4): 0.696
    8192: (128, 64, (4, 8, 4)),  # realcat-A (64,128): 0.781
    16384: (256, 64, (4, 8, 8)),  # 0.785 vs classic 1.226 and (128,128)
                                  # 0.904 (probe_r46)
}


def _irfft_rows_core(Xr, Xi, n, scale=None, *, interpret=False,
                     padded_in=False):
    """Batched C2R over the last axis: split half spectrum [..., n//2+1]
    -> real float32 [..., n] in one HBM round trip.

    `scale` multiplies the result; numpy's backward norm is scale=1/n.
    Requires power-of-two n with n/128 even (n >= 256) in the fused
    envelope; callers fall back to the packed XLA path otherwise.

    padded_in=True accepts the PADDED serving form [..., pad_bins(n)]
    (zeros beyond bin n//2, e.g. from rfft pad_out=True) and skips the
    explicit jnp.pad pass — a full extra HBM round trip on the input
    (probe_r45: C2R 4096 0.678 with the pad pass vs 0.436 without).
    """
    if not _supported(n) or (n // 128) % 2:
        raise Unsupported(f"n={n} outside C2R kernel envelope")
    m = n // 2
    bins = pad_bins(n) if padded_in else m + 1
    if Xr.shape[-1] != bins:
        raise Unsupported(f"expected {bins} bins, got {Xr.shape[-1]}")
    balanced = n in _BALANCED_C2R
    Q = n // 128
    # K2 padded to a sublane multiple: ragged second-minor dims (17) are
    # hostile to Mosaic; the kernel's validity mask zeroes the pad rows.
    K2 = _round_up(m // 128 + 1, 8)
    mp_in = _round_up(bins, 128) if balanced else K2 * 128

    lead = Xr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return jnp.zeros((*lead, n), jnp.float32)
    if mp_in == bins:
        Xr2 = Xr.reshape(rows, mp_in)
        Xi2 = Xi.reshape(rows, mp_in)
    else:
        pad = [(0, 0)] * (Xr.ndim - 1) + [(0, mp_in - bins)]
        Xr2 = jnp.pad(Xr, pad).reshape(rows, mp_in)
        Xi2 = jnp.pad(Xi, pad).reshape(rows, mp_in)

    if balanced:
        tile = _pick_pipe_tile(rows) if n in _PIPE_C2R else 128
    else:
        tile = _row_tile(n)
    bt = min(tile, _round_up(rows, 128))

    sc = float(scale) if scale is not None else 1.0
    if balanced:
        ent = _BALANCED_C2R[n]
        n1, n2 = ent[0], ent[1]
        factors = ent[2] if len(ent) > 2 else None

    def _kern_for(bt_):
        if balanced:
            if bt_ == 256 and n in _PIPE_C2R and factors is not None:
                return functools.partial(_kernel_c2r_pipe, n=n, n1=n1,
                                         n2=n2, scale=sc, factors=factors)
            return functools.partial(_kernel_c2r_bal, n=n, n1=n1, n2=n2,
                                     scale=sc, factors=factors)
        return functools.partial(
            _kernel_c2r, n=n, Q=Q, K2=K2, nyq=m // 128, scale=sc)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, mp_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return (pl.pallas_call(
            _kern_for(bt_),
            grid=(nblocks,),
            in_specs=[in_spec, in_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=(4 * n * 128 + 6 * n * K2) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (2 * mp_in + n),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins),)

    (out,) = _edge_tiled(_launch, (Xr2, Xi2), rows, bt)
    return out.reshape(*lead, n)


def irfft_prod_rows_split(Ar, Ai, Br, Bi, n, scale=None, *,
                          interpret=False, padded_in=False):
    """Fused spectrum-product C2R: real(IRFFT(A .* B)) over the last
    axis with the complex multiply computed at load on the VMEM tiles —
    the fftconvolve/oaconvolve epilogue without the separate HBM
    multiply pass (one spectrum write + read saved per call).
    Balanced-C2R envelope only; NOT differentiable here — callers wrap
    it with a composed-backward custom_vjp (ops/rfft.py).
    Reference anchor: the fused-epilogue idea, fft_wgpu
    src/kernel/ifft.wgsl:65-74, applied to the convolution product."""
    if not _supported(n) or (n // 128) % 2 or n not in _BALANCED_C2R:
        raise Unsupported(f"n={n} outside fused product-C2R envelope")
    m = n // 2
    bins = pad_bins(n) if padded_in else m + 1
    if Ar.shape[-1] != bins or Br.shape[-1] != bins:
        raise Unsupported(f"expected {bins} bins")
    broadcast_b = Br.ndim == 1
    if not broadcast_b and Br.shape != Ar.shape:
        raise Unsupported("spectrum operands must have equal shapes "
                          "(or a 1-D broadcast B)")
    mp_in = _round_up(bins, 128)

    lead = Ar.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return jnp.zeros((*lead, n), jnp.float32)

    def _prep(v, flat=False):
        if mp_in != bins:
            pad = [(0, 0)] * (v.ndim - 1) + [(0, mp_in - bins)]
            v = jnp.pad(v, pad)
        return v.reshape(1, mp_in) if flat else v.reshape(rows, mp_in)

    a_ins = (_prep(Ar), _prep(Ai))
    b_ins = (_prep(Br, broadcast_b), _prep(Bi, broadcast_b))
    bt = min(128, _round_up(rows, 128))
    sc = float(scale) if scale is not None else 1.0
    ent = _BALANCED_C2R[n]
    n1, n2 = ent[0], ent[1]
    factors = ent[2] if len(ent) > 2 else None

    def _launch(ins_, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, mp_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        b_spec = (pl.BlockSpec((1, mp_in), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
                  if broadcast_b else in_spec)
        out_spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        # broadcast B rides OUTSIDE the edge-tiled inputs: _edge_tiled
        # tail-slices every tiled array along the row axis, which would
        # empty a 1-row broadcast spectrum
        args = (*ins_, *b_ins) if broadcast_b else ins_
        return (pl.pallas_call(
            functools.partial(_kernel_c2r_bal_prod, n=n, n1=n1, n2=n2,
                              scale=sc, factors=factors,
                              broadcast_b=broadcast_b),
            grid=(nblocks,),
            in_specs=[in_spec, in_spec, b_spec, b_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=(4 * n * 128 + 12 * mp_in) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (4 * mp_in + n),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*args),)

    tiled = a_ins if broadcast_b else (*a_ins, *b_ins)
    (out,) = _edge_tiled(_launch, tiled, rows, bt)
    return out.reshape(*lead, n)


# Fused whole-plane fft2: both trailing axes in ONE VMEM residency.
# Envelope: A, B powers of two >= 128 (the in-kernel chain reshapes need
# 128-multiple minors on both orientations) with a DIT schedule each.
# Bound = the measured WIN region (probe_r42, v5e): 128^2 1.88x and
# 256^2 2.49x over the two-pass form, but 512^2 0.95x and 1024^2 0.50x
# (one whole plane per grid step stops pipelining as planes grow; the
# two-pass form's tuned 128-row tiles win back).
_FFT2F_MAX_ELEMS = 1 << 16


def _kernel_fft2f(xr_ref, xi_ref, or_ref, oi_ref, *, A, B, sign, scale):
    """[A, B] plane resident in VMEM: FFT over B (transpose + sublane
    chain), FFT over A (transpose back + sublane chain, scale folded).
    One HBM read and one write per element for BOTH axes — the two-pass
    form (fft2_split fallback) pays two full round trips."""
    ar = xr_ref[0]
    ai = xi_ref[0]
    br, bi = _dft_sublane_chain(ar.T, ai.T, B, sign, 1.0)      # [kb, A]
    dr, di = _dft_sublane_chain(br.T, bi.T, A, sign, scale)    # [ka, kb]
    or_ref[0] = dr
    oi_ref[0] = di


def _fft2f_supported(A: int, B: int) -> bool:
    for n in (A, B):
        if n < 128 or n & (n - 1):
            return False
        try:
            _dit_schedule(n)
        except Unsupported:
            return False
    return A * B <= _FFT2F_MAX_ELEMS


def _fft2_fused_core(re, im, sign, scale=None, *, interpret=False):
    A, B = re.shape[-2], re.shape[-1]
    if not _fft2f_supported(A, B):
        raise Unsupported(f"fft2 plane ({A},{B}) outside fused-plane "
                          "envelope")
    lead = re.shape[:-2]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im
    re3 = re.reshape(rows, A, B)
    im3 = im.reshape(rows, A, B)
    kern = functools.partial(
        _kernel_fft2f, A=A, B=B, sign=sign,
        scale=float(scale) if scale is not None else 1.0,
    )
    spec = pl.BlockSpec((1, A, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, A, B), jnp.float32),
            jax.ShapeDtypeStruct((rows, A, B), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * A * B * 40,
            bytes_accessed=4 * rows * A * B * 4,
            transcendentals=0,  # all twiddles are trace-time constants
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=_interp(interpret),
    )(re3, im3)
    return out_r.reshape(*lead, A, B), out_i.reshape(*lead, A, B)


def fft2_fused_split(re, im, sign, scale=None, *, interpret=False):
    """Single-round-trip 2-D FFT over the trailing axes (both axes done
    inside one VMEM residency).  Differentiable both modes (exact linear
    adjoint: sign-flipped kernel, same scale; _linear2 is defined in the
    AD section below and resolves at call time)."""
    return _linear2(
        lambda a, b: _fft2_fused_core(a, b, sign, scale,
                                      interpret=interpret),
        lambda a, b: _fft2_fused_core(a, b, -sign, scale,
                                      interpret=interpret),
        re, im)


def fft2_split(re, im, sign, scale=None, *, interpret=False):
    """2-D FFT over the last two axes as TWO transposed-rows passes.

    fft_rows_transposed_split computes row FFTs and emits the transposed
    plane, so applying it twice yields the full 2-D transform back in
    natural [ka, kb] order with no explicit transpose anywhere:

        pass 1: X[a, b]   -> Y[kb, a]   (FFT over b)
        pass 2: Y[kb, a]  -> Z[ka, kb]  (FFT over a; output scale folded)

    Both axes must be in the fused envelope; caller falls back otherwise.
    """
    A, B = re.shape[-2], re.shape[-1]
    if not (_supported(A) and _supported(B)):
        raise Unsupported(f"fft2 axes ({A},{B}) outside fused envelope")
    r1, i1 = fft_rows_transposed_split(re, im, sign, None, interpret=interpret)
    return fft_rows_transposed_split(r1, i1, sign, scale, interpret=interpret)


# --------------------------------------------------------------------- #
# Autodiff: exact linear adjoints for every Pallas entry point.
# --------------------------------------------------------------------- #
#
# pallas_call has no automatic differentiation rule, but each transform
# here is LINEAR, so `jax.custom_derivatives.linear_call(f, f_T, ...)`
# provides BOTH forward-mode (jvp = the transform of the tangents) and
# reverse-mode (vjp = the transpose) from one transpose definition:
#
#   * C2C with sign s and folded scale k:  M = k*W_s with W_s symmetric,
#     so M^T = k*W_{-s} — the SAME kernel, sign flipped, same scale.
#   * R2C (half spectrum, scale k):  transpose(ct)[m] =
#     k*Re(sum_{bins} ct[b] e^{+2pi i b m/n}) — zero-pad the cotangent
#     bins to n and take the real part of an UNSYMMETRIZED +sign C2C.
#   * C2R (x = 2k*Re sum' eps_b X[b] e^{+..}): transpose(ct) =
#     2k*eps_b * (R2C forward of ct), eps = 1/2 at DC/Nyquist.
#
# This is what makes `jax.grad` (and `jax.jvp`) flow through ftt.fft /
# rfft / the FNO training step ON TPU; the CPU/XLA fallback paths are
# natively differentiable.  The reference has no AD story at all.
#
# Known limitation: linear_call has no jax.vmap batching rule.  This is
# deliberate: every kernel here already accepts ARBITRARY leading batch
# dims natively (inputs are flattened to a row batch), so mapping over
# leading axes needs no vmap — reshape/stack instead.

from jax import custom_derivatives as _cd


def _linear2(fwd, transpose, re, im):
    """linear_call over a split (re, im) pair with matching transpose."""
    return _cd.linear_call(lambda _, lin: fwd(*lin),
                           lambda _, ct: transpose(*ct),
                           (), (re, im))


def fft_batched_split(re, im, sign, scale=None, *, row_tile=None,
                      interpret=False, schedule=None):
    """Batched FFT over the last axis via the fused Pallas kernel.

    re/im: float32 [..., n] (leading dims flattened to a row batch).
    sign: -1 forward / +1 inverse; scale folded into the last stage.
    Differentiable both modes (exact adjoint: the sign-flipped kernel).
    """
    kw = dict(row_tile=row_tile, interpret=interpret, schedule=schedule)
    return _linear2(
        lambda a, b: _fft_batched_core(a, b, sign, scale, **kw),
        lambda a, b: _fft_batched_core(a, b, -sign, scale, **kw),
        re, im)


def fft_axis0_split(re, im, sign, scale=None, *, interpret=False):
    """Batched FFT along axis -2 of [..., n, m] via the transpose-free
    sublane-domain kernel (the lane axis m carries the batch).
    Differentiable both modes (sign-flipped adjoint)."""
    return _linear2(
        lambda a, b: _fft_axis0_core(a, b, sign, scale, interpret=interpret),
        lambda a, b: _fft_axis0_core(a, b, -sign, scale, interpret=interpret),
        re, im)


def _fft_filtered_core(re, im, hr, hi, sign, scale=None, *,
                       interpret=False):
    """Batched FFT over the last axis with a FUSED elementwise input
    filter multiply x <- x * h (h broadcast over rows) — the cuFFT
    load-callback analogue.  The multiply runs on the VMEM-resident tile
    under the DMA pipeline, so a filter->FFT pass costs the same HBM
    traffic as a bare FFT (a separate XLA multiply costs a full extra
    round trip).  Reference analogue: none (fft_wgpu has no callbacks);
    this is the fast-convolution serving path."""
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im
    re2 = re.reshape(rows, n)
    im2 = im.reshape(rows, n)
    hr2 = jnp.asarray(hr, jnp.float32).reshape(1, n)
    hi2 = jnp.asarray(hi, jnp.float32).reshape(1, n)

    balanced = n in _BALANCED
    tile = 128 if balanced else _row_tile(n)
    bt = min(tile, _round_up(rows, 128))

    sc = float(scale) if scale is not None else 1.0
    if balanced:
        n1, n2, s1_factors = _BALANCED[n]
        kern = functools.partial(
            _kernel_rows_bal_filt, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
            factors=s1_factors,
        )
    else:
        n1, n2 = _choose_split(n)
        kern = functools.partial(
            _kernel_filt, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
        )
    flops_per_row = 8 * n * (n1 + n2) + 12 * n

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[spec, spec, hspec, hspec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * n * 4 + 8 * n,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins, hr2, hi2)

    out_r, out_i = _edge_tiled(_launch, (re2, im2), rows, bt)
    return out_r.reshape(*lead, n), out_i.reshape(*lead, n)


def _kernel_rows_bal_bank(xr_ref, xi_ref, hr_ref, hi_ref, or_ref,
                          oi_ref, *, n, n1, n2, sign, scale, factors):
    """Filter-BANK kernel: ONE broadcast signal row x per-row filters
    (y[s] = FFT(x * h[s])) — the CWT/channelizer shape."""
    xr = xr_ref[0]
    xi = xi_ref[0]
    hr = hr_ref[:]
    hi = hi_ref[:]
    _rows_bal_math(hr * xr - hi * xi, hr * xi + hi * xr, or_ref, oi_ref,
                   n=n, n1=n1, n2=n2, sign=sign, scale=scale,
                   factors=factors)


def _kernel_bank(xr_ref, xi_ref, hr_ref, hi_ref, or_ref, oi_ref, *, n,
                 n1, n2, sign, scale):
    xr = xr_ref[0]
    xi = xi_ref[0]
    hr = hr_ref[:]
    hi = hi_ref[:]
    _rows_classic_math(hr * xr - hi * xi, hr * xi + hi * xr, or_ref,
                       oi_ref, n=n, n1=n1, n2=n2, sign=sign, scale=scale)


def _fft_bank_core(re, im, hr, hi, sign, scale=None, *, interpret=False):
    """y[s, :] = scale * FFT_sign(x * h[s]): one signal row against a
    whole filter bank, the multiply fused into each tile's load stage.
    x: [n]; h: [S, n]; out [S, n].  The signal block rides a constant
    index map, so it is NEVER materialized at [S, n] in HBM — the bank
    transform costs ONE bank-sized round trip."""
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside fused kernel envelope")
    if re.ndim != 1 or hr.shape[-1] != n:
        raise Unsupported("bank kernel expects x [n], h [S, n]")
    S = hr.shape[0]
    re2 = re.reshape(1, n)
    im2 = im.reshape(1, n)

    balanced = n in _BALANCED
    tile = 128 if balanced else _row_tile(n)
    bt = min(tile, _round_up(S, 128))

    sc = float(scale) if scale is not None else 1.0
    if balanced:
        n1, n2, s1_factors = _BALANCED[n]
        kern = functools.partial(
            _kernel_rows_bal_bank, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
            factors=s1_factors,
        )
    else:
        n1, n2 = _choose_split(n)
        kern = functools.partial(
            _kernel_bank, n=n, n1=n1, n2=n2, sign=sign, scale=sc,
        )
    flops_per_row = 8 * n * (n1 + n2) + 12 * n

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        spec = pl.BlockSpec((bt_, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        xspec = pl.BlockSpec((1, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[xspec, xspec, spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, n), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=flops_per_row * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * n * 3 + 8 * n,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(re2, im2, *ins)

    out_r, out_i = _edge_tiled(_launch, (hr, hi), S, bt)
    return out_r, out_i


def fft_bank_split(re, im, hr, hi, sign, scale=None, *, interpret=False):
    """Filter-bank transform y[s] = scale * FFT_sign(x * h[s]) with the
    per-row multiply fused into each tile's load stage (x [n] broadcast
    by index map — never materialized at bank size).  Linear in the
    signal (re, im); the bank is constant.  Adjoint: sum_s conj(h[s]) *
    (scale * FFT_{-sign}(ct[s]))."""

    def fwd(res, lin):
        a, b = lin
        hr_, hi_ = res
        return _fft_bank_core(a, b, hr_, hi_, sign, scale,
                              interpret=interpret)

    def tr(res, ct):
        g, h = ct
        hr_, hi_ = res
        gr, gi = _fft_batched_core(g, h, -sign, scale,
                                   interpret=interpret)
        return (jnp.sum(gr * hr_ + gi * hi_, axis=0),
                jnp.sum(gi * hr_ - gr * hi_, axis=0))

    return _cd.linear_call(fwd, tr, (jnp.asarray(hr, jnp.float32),
                                     jnp.asarray(hi, jnp.float32)),
                           (re, im))


def fft_filtered_split(re, im, hr, hi, sign, scale=None, *,
                       interpret=False):
    """y = scale * FFT_sign(h * x) with the h-multiply fused into the
    kernel's load stage.  Linear in (re, im) with h constant;
    differentiable both modes.  Adjoint: conj(h) * (scale *
    FFT_{-sign}(ct)) — an output-side multiply, applied as XLA
    elementwise on the (rare) backward path."""

    def fwd(res, lin):
        a, b = lin
        hr_, hi_ = res
        return _fft_filtered_core(a, b, hr_, hi_, sign, scale,
                                  interpret=interpret)

    def tr(res, ct):
        g, h = ct
        hr_, hi_ = res
        gr, gi = _fft_batched_core(g, h, -sign, scale,
                                   interpret=interpret)
        hr_ = jnp.asarray(hr_, jnp.float32)
        hi_ = jnp.asarray(hi_, jnp.float32)
        return gr * hr_ + gi * hi_, gi * hr_ - gr * hi_

    return _cd.linear_call(fwd, tr, (jnp.asarray(hr, jnp.float32),
                                     jnp.asarray(hi, jnp.float32)),
                           (re, im))


def _fft_filt_pad_core(re, im, hr, hi, m, sign, scale=None, *,
                       interpret=False):
    """Bluestein forward pass: FFT_m(zero_pad_m(h .* x)) over the last
    axis, with the chirp multiply and the zero-pad fused into the
    kernel's load stage.  re/im: [..., n_in] with n_in a 128-multiple;
    h: [n_in].  Returns [..., m]."""
    n_in = re.shape[-1]
    if m not in _BALANCED or not _supported(m):
        raise Unsupported(f"m={m} outside balanced fused envelope")
    if n_in % 128 or n_in > m:
        raise Unsupported(f"n_in={n_in} must be a 128-multiple <= m")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        z = jnp.zeros((*lead, m), jnp.float32)
        return z, z
    re2 = re.reshape(rows, n_in)
    im2 = im.reshape(rows, n_in)
    hr2 = jnp.asarray(hr, jnp.float32).reshape(1, n_in)
    hi2 = jnp.asarray(hi, jnp.float32).reshape(1, n_in)

    bt = min(128, _round_up(rows, 128))
    sc = float(scale) if scale is not None else 1.0
    n1, n2, s1_factors = _BALANCED[m]
    kern = functools.partial(
        _kernel_rows_bal_filt_pad, n=m, n1=n1, n2=n2, sign=sign,
        scale=sc, factors=s1_factors, n_in=n_in)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, n_in), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt_, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, n_in), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[in_spec, in_spec, hspec, hspec],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, m), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, m), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(8 * m * (n1 + n2) + 6 * m) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (n_in + m) * 2,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins, hr2, hi2)

    out_r, out_i = _edge_tiled(_launch, (re2, im2), rows, bt)
    return out_r.reshape(*lead, m), out_i.reshape(*lead, m)


def _fft_filt_narrow_core(re, im, hr, hi, gr, gi, n_out, sign, scale=None,
                          *, interpret=False):
    """Bluestein inverse pass: g .* FFT_m(h .* x)[..., :n_out] over the
    last axis — load-filter multiply, output slice, and post-chirp
    multiply all fused; stage 2 cut to the contributing k2 rows.
    re/im: [..., m]; h: [m]; g: [n_out] (n_out a 128-multiple).
    Returns [..., n_out]."""
    m = re.shape[-1]
    if m not in _BALANCED or not _supported(m):
        raise Unsupported(f"m={m} outside balanced fused envelope")
    if n_out % 128 or n_out > m:
        raise Unsupported(f"n_out={n_out} must be a 128-multiple <= m")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        z = jnp.zeros((*lead, n_out), jnp.float32)
        return z, z
    re2 = re.reshape(rows, m)
    im2 = im.reshape(rows, m)
    hr2 = jnp.asarray(hr, jnp.float32).reshape(1, m)
    hi2 = jnp.asarray(hi, jnp.float32).reshape(1, m)
    gr2 = jnp.asarray(gr, jnp.float32).reshape(1, n_out)
    gi2 = jnp.asarray(gi, jnp.float32).reshape(1, n_out)

    bt = min(128, _round_up(rows, 128))
    sc = float(scale) if scale is not None else 1.0
    n1, n2, s1_factors = _BALANCED[m]
    kern = functools.partial(
        _kernel_rows_bal_filt_narrow, n=m, n1=n1, n2=n2, sign=sign,
        scale=sc, factors=s1_factors, n_out=n_out)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt_, n_out), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        gspec = pl.BlockSpec((1, n_out), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[in_spec, in_spec, hspec, hspec, gspec, gspec],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n_out), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, n_out), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(8 * m * n1 + 8 * n_out * n2 + 6 * m) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (m + n_out) * 2,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins, hr2, hi2, gr2, gi2)

    out_r, out_i = _edge_tiled(_launch, (re2, im2), rows, bt)
    return out_r.reshape(*lead, n_out), out_i.reshape(*lead, n_out)


def fft_chirp_forward_split(re, im, hr, hi, m, sign, *, interpret=False):
    """y = FFT_m(zero_pad(h .* x)): the fused Bluestein forward pass.
    Linear in (re, im); h constant.  Adjoint: conj(h) .*
    FFT_{-sign}(ct)[..., :n_in] (XLA ops on the rare backward path)."""
    n_in = re.shape[-1]

    def fwd(res, lin):
        a, b = lin
        hr_, hi_ = res
        return _fft_filt_pad_core(a, b, hr_, hi_, m, sign,
                                  interpret=interpret)

    def tr(res, ct):
        g, h = ct
        hr_, hi_ = res
        gr_, gi_ = _fft_batched_core(g, h, -sign, None,
                                     interpret=interpret)
        gr_ = gr_[..., :n_in]
        gi_ = gi_[..., :n_in]
        return gr_ * hr_ + gi_ * hi_, gi_ * hr_ - gr_ * hi_

    return _cd.linear_call(fwd, tr, (jnp.asarray(hr, jnp.float32),
                                     jnp.asarray(hi, jnp.float32)),
                           (re, im))


def fft_chirp_inverse_split(re, im, hr, hi, gr, gi, n_out, sign,
                            scale=None, *, interpret=False):
    """y = g .* (scale * FFT_sign(h .* x))[..., :n_out]: the fused
    Bluestein inverse pass.  Linear in (re, im); h, g constant.
    Adjoint: conj(h) .* (scale * FFT_{-sign}(zero_pad(conj(g) .* ct)))."""
    m = re.shape[-1]

    def fwd(res, lin):
        a, b = lin
        hr_, hi_, gr_, gi_ = res
        return _fft_filt_narrow_core(a, b, hr_, hi_, gr_, gi_, n_out,
                                     sign, scale, interpret=interpret)

    def tr(res, ct):
        g, h = ct
        hr_, hi_, gr_, gi_ = res
        cr = g * gr_ + h * gi_
        ci = h * gr_ - g * gi_
        pad = [(0, 0)] * (cr.ndim - 1) + [(0, m - n_out)]
        ar, ai = _fft_batched_core(jnp.pad(cr, pad), jnp.pad(ci, pad),
                                   -sign, scale, interpret=interpret)
        return ar * hr_ + ai * hi_, ai * hr_ - ar * hi_

    return _cd.linear_call(
        fwd, tr,
        (jnp.asarray(hr, jnp.float32), jnp.asarray(hi, jnp.float32),
         jnp.asarray(gr, jnp.float32), jnp.asarray(gi, jnp.float32)),
        (re, im))


# --------------------------------------------------------------------- #
# Generic two-factor rows kernel: single-pass FFT for ANY composite n
# (not just powers of two).
# --------------------------------------------------------------------- #
#
# Why it exists (round 4): non-pow2 composite lengths used to ride
# Bluestein (two fused m-passes at m = next_pow2(2n-1) >= 2n of data) or
# the XLA mixed-radix recursion (multiple HBM passes).  But the balanced
# kernels' transpose-in trick generalizes: once the row is on the
# SUBLANE axis (minor dim = bt = 128 lanes), sublane reshapes are legal
# for ANY factorization n = n1*n2 — no 128-multiple constraint.  So
# n=4097=17*241 becomes ONE VMEM-resident pass: transpose-in, slice the
# pad rows off (sublane slice, free), n1-point DFT dot, twiddle,
# n2-point DFT dot, zero-fill back to the padded height, transpose out.
# The ragged lane extent n is handled by 128-aligned pad/slice at the
# XLA boundary (n-sized passes — tiny next to Bluestein's m-sized ones).

def _kernel_rows_gen(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale, n_pad):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T[:n].reshape(n1, n2, bt)
    ai = xi_ref[:].T[:n].reshape(n1, n2, bt)
    # stage 1: contract m1 (dim 0) -> [k1, n2, bt]
    if 2 * n1 <= 128:
        br, bi = _cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
    else:
        w1r, w1i = _gen_dft(n1, n1, n1, sign)
        br, bi = _cdot(w1r, w1r + w1i, w1i - w1r, ar, ai, ((1,), (0,)))
    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    # stage 2: contract m2 (dim 1) -> [k2, k1, bt]; flat k = k2*n1 + k1
    if 2 * n2 <= 128:
        dr, di = _cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)), scale)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    dr = dr.reshape(n, bt)
    di = di.reshape(n, bt)
    if n_pad != n:
        z = jnp.zeros((n_pad - n, bt), jnp.float32)
        dr = jnp.concatenate([dr, z], axis=0)
        di = jnp.concatenate([di, z], axis=0)
    or_ref[:] = dr.T
    oi_ref[:] = di.T


def _choose_general_split(n: int):
    """Minimal-MAC divisor pair (n1, n2), n1 <= n2, n1*n2 = n; None if
    n has no such factorization.  Factor bound history: factors > 128
    used to HANG the remote compile service inside a C call where not
    even SIGALRM fires (probe_r63: (3,257) and (17,241) hung; (25,40)
    and (63,65) compiled).  A toolchain update fixed that class —
    re-probed 2026-08-21 (scripts/toolchain_watch.py prime257_hang:
    CHANGED; probe_r70: (3,257)@771 0.098 ms, (17,241)@4097 0.878 ms
    [vs 1.553 fused Bluestein], (2,257)@514 0.130 ms, all rel ~2e-7) —
    so the bound is now 256: lengths whose only factorization passes
    through a prime in (128, 256] run the one-pass kernel instead of
    two fused Bluestein m-passes.  Primes > 256 still ride Bluestein.
    If a future toolchain regresses, toolchain_watch turns the re-check
    into one command."""
    best = None
    d = 2
    while d * d <= n:
        if n % d == 0:
            pair = (d, n // d)
            if pair[1] <= 256 and (best is None
                                   or sum(pair) < sum(best)):
                best = pair
        d += 1
    return best


def _fft_rows_gen_core(re, im, sign, scale=None, *, interpret=False):
    """Single-pass batched FFT over the last axis for composite non-pow2
    n in [512, 16384].  One HBM round trip (+ two cheap n-sized
    pad/slice passes at the 128-alignment boundary) — replaces the
    ~2 fused m-sized Bluestein passes (m >= 2n) for composite n.
    Reference analogue: none (fft_wgpu is pow2-only,
    src/processor.rs:327)."""
    n = re.shape[-1]
    if n < 512 or n > FUSED_MAX_N or (n & (n - 1)) == 0:
        raise Unsupported(f"n={n} outside general-kernel envelope")
    split = _choose_general_split(n)
    if split is None:
        raise Unsupported(f"n={n} has no balanced factorization")
    n1, n2 = split
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im
    n_pad = _round_up(n, 128)
    re2 = re.reshape(rows, n)
    im2 = im.reshape(rows, n)
    if n_pad != n:
        re2 = jnp.pad(re2, ((0, 0), (0, n_pad - n)))
        im2 = jnp.pad(im2, ((0, 0), (0, n_pad - n)))

    bt = min(128, _round_up(rows, 128))
    sc = float(scale) if scale is not None else 1.0
    kern = functools.partial(_kernel_rows_gen, n=n, n1=n1, n2=n2,
                             sign=sign, scale=sc, n_pad=n_pad)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        spec = pl.BlockSpec((bt_, n_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[spec, spec],
            out_specs=[spec, spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, n_pad), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, n_pad), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(8 * n * (n1 + n2) + 6 * n) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * n_pad * 4,
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (re2, im2), rows, bt)
    return (out_r[..., :n].reshape(*lead, n),
            out_i[..., :n].reshape(*lead, n))


def fft_rows_general_split(re, im, sign, scale=None, *, interpret=False):
    """Composite non-pow2 single-pass rows FFT (see _fft_rows_gen_core).
    Differentiable both modes (sign-flipped adjoint, the convention of
    every kernel in this module)."""
    kw = dict(interpret=interpret)
    return _linear2(
        lambda a, b: _fft_rows_gen_core(a, b, sign, scale, **kw),
        lambda a, b: _fft_rows_gen_core(a, b, -sign, scale, **kw),
        re, im)


def _kernel_r2c_gen(x_ref, or_ref, oi_ref, *, n, n1, n2, scale, n_pad,
                    mp, mp_out):
    """General-n R2C: real [bt, n_pad] -> split half spectrum
    [bt, mp_out].  REAL-specialized stage 1 (one stacked [2n1, n1] dot
    at K = n1 — half the complex kernel's contraction) and the stage-2
    dot cut to the ceil(mp/n1) contributing k2 rows.  Works for ODD n
    too (mp = n//2+1 bins, no Nyquist): the even-only half-size pack
    path of the XLA fallback cannot."""
    sign = -1
    bt = x_ref.shape[0]
    ar = x_ref[:].T[:n].reshape(n1, n2, bt)
    w1r, w1i = _gen_dft(n1, n1, n1, sign)
    wcat = jnp.concatenate([w1r, w1i], axis=0)  # [2n1, n1]
    res = _dot_prec(wcat, ar, ((1,), (0,)))
    br, bi = res[:n1], res[n1:]
    twr, twi = _gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    k2c = -(-mp // n1)  # flat bin k = k2*n1 + k1 < mp
    if 2 * n2 <= 128:
        dr, di = _cdot_realcat_cut(n2, sign, cr, ci, 1, ((1,), (1,)),
                                   scale, k2c)
    else:
        w2r, w2i = _gen_dft(n2, n2, n2, sign, scale)
        dr, di = _cdot(w2r[:k2c], w2r[:k2c] + w2i[:k2c],
                       w2i[:k2c] - w2r[:k2c], cr, ci, ((1,), (1,)))
    dr = dr.reshape(k2c * n1, bt)[:mp]
    di = di.reshape(k2c * n1, bt)[:mp]
    if mp_out != mp:
        z = jnp.zeros((mp_out - mp, bt), jnp.float32)
        dr = jnp.concatenate([dr, z], axis=0)
        di = jnp.concatenate([di, z], axis=0)
    or_ref[:] = dr.T
    oi_ref[:] = di.T


def _rfft_gen_core(xr, scale=None, *, interpret=False):
    """Single-pass general-n R2C over the last axis: real [..., n] ->
    split [..., round_up(n//2+1, 128)] (always the PADDED serving form;
    callers slice at the public boundary).  Envelope: composite n in
    [512, 16384] with both factors <= 256 (the round-5 bound —
    _choose_general_split), n not pow2."""
    n = xr.shape[-1]
    if n < 512 or n > FUSED_MAX_N or (n & (n - 1)) == 0:
        raise Unsupported(f"n={n} outside general-kernel envelope")
    split = _choose_general_split(n)
    if split is None:
        raise Unsupported(f"n={n} has no balanced factorization")
    n1, n2 = split
    mp = n // 2 + 1
    mp_out = _round_up(mp, 128)
    lead = xr.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        z = jnp.zeros((*lead, mp_out), jnp.float32)
        return z, z
    n_pad = _round_up(n, 128)
    x2 = xr.reshape(rows, n)
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, 0), (0, n_pad - n)))

    bt = min(128, _round_up(rows, 128))
    sc = float(scale) if scale is not None else 1.0
    kern = functools.partial(_kernel_r2c_gen, n=n, n1=n1, n2=n2,
                             scale=sc, n_pad=n_pad, mp=mp, mp_out=mp_out)

    def _launch(ins, out_rows, nblocks, bt_, start=0):
        in_spec = pl.BlockSpec((bt_, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt_, mp_out), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            grid=(nblocks,),
            in_specs=[in_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[
                jax.ShapeDtypeStruct((out_rows, mp_out), jnp.float32),
                jax.ShapeDtypeStruct((out_rows, mp_out), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=(4 * n * n1 + 8 * mp * n2) * nblocks * bt_,
                bytes_accessed=4 * nblocks * bt_ * (n_pad + 2 * mp_out),
                transcendentals=0,
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024,
            ),
            interpret=_interp(interpret),
        )(*ins)

    out_r, out_i = _edge_tiled(_launch, (x2,), rows, bt)
    return (out_r.reshape(*lead, mp_out), out_i.reshape(*lead, mp_out))


def rfft_rows_general_split(xr, scale=None, *, interpret=False,
                            pad_out=False):
    """General-n single-pass R2C (composite non-pow2, incl. ODD n).
    Returns [..., n//2+1] (or the padded serving form with
    pad_out=True).  Differentiable (adjoint: zero-padded +1-sign general
    C2C, real part — pad-column cotangents are discarded, the kernel
    writes exact zeros there)."""
    n = xr.shape[-1]
    mp = n // 2 + 1

    def fwd(_, lin):
        Rr, Ri = _rfft_gen_core(lin[0], scale, interpret=interpret)
        if not pad_out:
            Rr = Rr[..., :mp]
            Ri = Ri[..., :mp]
        return Rr, Ri

    def transpose(_, ct):
        ctr, cti = ct
        if ctr.shape[-1] > mp:  # padded form: pad columns are zeros
            ctr = ctr[..., :mp]
            cti = cti[..., :mp]
        pad = [(0, 0)] * (ctr.ndim - 1) + [(0, n - mp)]
        gr, _gi = _fft_rows_gen_core(jnp.pad(ctr, pad), jnp.pad(cti, pad),
                                     +1, scale, interpret=interpret)
        return (gr,)

    return _cd.linear_call(fwd, transpose, (), (xr,))


def _outer_tw_conj(R, n, sign, outer):
    """conj of the rows_t outer twiddle as XLA arrays: exp(-sign*2pi*i*
    r*m/outer_n) with exact f32 index math (products < outer_n <= 2^22)."""
    _, outer_n = outer
    r = jnp.arange(R, dtype=jnp.float32)[:, None]
    m = jnp.arange(n, dtype=jnp.float32)[None, :]
    t = r * m
    rr = t - outer_n * jnp.floor(t / outer_n)
    th = (-sign * 2.0 * math.pi / outer_n) * rr
    return jnp.cos(th), jnp.sin(th)


def fft_rows_transposed_split(re, im, sign, scale=None, *, outer=None,
                              interpret=False):
    """FFT each length-n row of [..., R, n]; returns [..., n, R] (the
    transposed result), optionally pre-multiplying row r by the outer
    four-step twiddle exp(sign*2pi*i*r*m/outer_n).  Differentiable.

    This is the second pass of the two-HBM-pass four-step (see
    ops/fourstep.py)."""

    def transpose(ctr, cti):
        # primal: x[.., R, n] -> transpose(rowsFFT(tw (.) x)); adjoint:
        # ct[.., n, R] -> conj(tw) (.) rowsFFT_conj(transpose(ct))
        gr = jnp.swapaxes(ctr, -1, -2)
        gi = jnp.swapaxes(cti, -1, -2)
        gr, gi = _fft_batched_core(gr, gi, -sign, scale, interpret=interpret)
        if outer is not None:
            twr, twi = _outer_tw_conj(gr.shape[-2], gr.shape[-1], sign, outer)
            gr, gi = gr * twr - gi * twi, gr * twi + gi * twr
        return gr, gi

    return _linear2(
        lambda a, b: _fft_rows_t_core(a, b, sign, scale, outer=outer,
                                      interpret=interpret),
        transpose, re, im)


def rfft_rows_split(xr, scale=None, *, interpret=False, pad_out=False):
    """Batched R2C FFT over the last axis: real float32 [..., n] ->
    split complex [..., n//2+1] (or the padded serving form
    [..., pad_bins(n)] with pad_out=True — exact zeros past bin n//2).
    One HBM round trip (fused kernel envelope; callers fall back to the
    packed XLA path outside it).  Differentiable (adjoint: zero-padded
    +sign C2C, real part; the padded form writes zeros in its pad
    columns, so their cotangents are discarded)."""
    n = xr.shape[-1]
    mp = n // 2 + 1

    def transpose(_, ct):
        ctr, cti = ct
        if ctr.shape[-1] > mp:  # padded form: pad columns are zeros
            ctr = ctr[..., :mp]
            cti = cti[..., :mp]
        pad = [(0, 0)] * (ctr.ndim - 1) + [(0, n - mp)]
        gr, _gi = _fft_batched_core(jnp.pad(ctr, pad), jnp.pad(cti, pad),
                                    +1, scale, interpret=interpret)
        return (gr,)

    return _cd.linear_call(
        lambda _, lin: _rfft_rows_core(lin[0], scale, interpret=interpret,
                                       pad_out=pad_out),
        transpose, (), (xr,))


def irfft_rows_split(Xr, Xi, n, scale=None, *, interpret=False,
                     padded_in=False):
    """Batched C2R over the last axis: split half spectrum [..., n//2+1]
    (or the padded serving form [..., pad_bins(n)] with padded_in=True —
    skips the explicit input pad pass) -> real float32 [..., n] in one
    HBM round trip.  Differentiable.

    `scale` multiplies the result; numpy's backward norm is scale=1/n.
    Requires power-of-two n with n/128 even (n >= 256) in the fused
    envelope; callers fall back to the packed XLA path otherwise."""

    def transpose(_, ct):
        # adjoint of x = 2k * Re sum' eps_b X[b] w^{+jb}:
        # g[b] = 2k * eps_b * (forward R2C of ct)[b], eps=1/2 at DC/Nyquist
        # (the kernel self-masks bins beyond Nyquist, so the padded form
        # gets exactly-zero pad-column cotangents)
        gr, gi = _rfft_rows_core(ct, None, interpret=interpret,
                                 pad_out=padded_in)
        k = 2.0 * (1.0 if scale is None else float(scale))
        m = n // 2
        eps = jnp.zeros((gr.shape[-1],), jnp.float32)
        eps = eps.at[:m + 1].set(1.0).at[0].set(0.5).at[m].set(0.5)
        return k * eps * gr, k * eps * gi

    return _cd.linear_call(
        lambda _, lin: _irfft_rows_core(lin[0], lin[1], n, scale,
                                        interpret=_interp(interpret),
                                        padded_in=padded_in),
        transpose, (), (Xr, Xi))
