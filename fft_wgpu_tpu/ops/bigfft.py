"""Single-pass fused large-N FFT: the whole row resident in VMEM.

The reference streams one radix-2 stage per dispatch through global memory
for ANY length (fft_wgpu src/processor.rs:327-330 — log2(n) HBM round
trips); round 1 replaced that with a two-pass HBM four-step
(ops/fourstep.py).  This kernel goes one further for rows that fit VMEM
(2^15 <= n <= ~2^21): ONE HBM read and ONE write per element — the same
single-round-trip property the fused row kernel has for n <= 16384 —
by running the entire four-step in VMEM:

    x[1, n] --free view--> A[S, 128]        (S = n/128; minor stays 128)
    1. B  = DFT_S over the SUBLANE axis      (DIT factor chain on the MXU:
                                              realcat32/64 atoms + VPU
                                              small-factor butterflies —
                                              pallas_fft._dft_sublane_chain)
    2. C  = B * w_n^(k_s * m_l)              (inter-factor twiddle; index
                                              products < n <= 2^21: f32-exact)
    3. D  = Gauss128 over the LANE axis      (scale folded; result order
                                              [k_l, k_s] IS natural order)
    4. out[1, n] = D.reshape(n)              (free merge)

Both input and output stay FLAT [rows, n] — there is no HBM-level
[.., n] <-> [.., n1, n2] reshape, which on TPU is a physical relayout that
cost the two-pass four-step ~60 us/call (PERFORMANCE.md).  The earlier
square [sqrt(n), sqrt(n)] layout (two sublane chains + in-VMEM transpose +
split-table outer twiddle) measured 1.17x slower (scripts/probe_bigv2.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_fft as pf

__all__ = ["fft_big_split", "BIG_MIN_N", "BIG_MAX_N", "Unsupported"]

Unsupported = pf.Unsupported

BIG_MIN_N = 1 << 15  # below: the fused row kernel handles it in one pass
BIG_MAX_N = 1 << 21  # above: whole-row VMEM working set exceeds v5e VMEM

# Batched (rows > 1) ceiling — measured crossover vs the two-pass
# four-step (probe_r72, v5e): the single-pass row-per-grid-step form
# wins while rows are small enough for the pipeline to hide the thin
# [S,128] dots — 2^15 x512 1.40x, 2^16 x256 1.65x — and loses once the
# four-step's full-width batched passes amortize (2^17 x128 0.93x,
# 2^18 x64 0.90x, 2^20 x8 0.92x); 2^21 multi-row OOMs VMEM outright
# (148M > 128M with double-buffered whole-row blocks).  Single rows
# keep the full BIG_MAX_N range (2^21 x1: 0.185 vs 0.287 four-step).
BATCHED_MAX_N = 1 << 16


# Sublane-chain schedule overrides for the big kernel's stage 1 (probe_r21/
# r22 on v5e: VPU-heavier chains beat the default realcat-heavy
# _dit_schedule here — the [S, 128] operands pay MXU fill penalties the VPU
# doesn't): 2^20 (S=8192): (4,4,8,64) 0.116 ms vs (4,4,4,4,32) 0.124,
# (2,4,4,4,64) 0.121, (8,32,32) default 0.134.
_CHAIN_SCHEDULE = {
    8192: (4, 4, 8, 64),
}

# Outer-twiddle form (probe_r40).  "direct": one [S, 128] in-register
# table — S*128 entries of iota+cos/sin (1M transcendental pairs at
# 2^20, the largest in-kernel table anywhere).  "factored": split
# k_s = 64 q + p so w_n^(k_s m) = w_{n/64}^(q m) * w_n^(p m) — two
# in-register tables of [S/64, 128] and [64, 128] (24K entries) and one
# extra broadcast complex multiply on the state.  Measured on v5e
# (probe_r40): factored wins at every size — 2^15 1.14x, 2^19 1.28x,
# 2^20 0.086 vs 0.115 ms (1.33x), 2^21 0.185 vs 0.240 (1.30x); the
# transcendental polynomial chains on 1M-entry tables were ~25% of the
# whole transform.  Numerics unchanged (both forms f32-exact index
# products; rel 1.6e-07 vs f64 oracle).
TW_FORM = "factored"


def _outer_twiddle_mul(br, bi, S, n, sign):
    if TW_FORM == "factored" and S % 64 == 0 and S >= 128:
        Q = S // 64
        t1r, t1i = pf._gen_dft(Q, 128, n // 64, sign)  # w_{n/64}^{q m}
        t2r, t2i = pf._gen_dft(64, 128, n, sign)       # w_n^{p m}
        b3r = br.reshape(Q, 64, 128)
        b3i = bi.reshape(Q, 64, 128)
        cr = b3r * t2r[None] - b3i * t2i[None]
        ci = b3r * t2i[None] + b3i * t2r[None]
        dr = cr * t1r[:, None, :] - ci * t1i[:, None, :]
        di = cr * t1i[:, None, :] + ci * t1r[:, None, :]
        return dr.reshape(S, 128), di.reshape(S, 128)
    twr, twi = pf._gen_twiddle(S, 128, n, sign)
    return br * twr - bi * twi, br * twi + bi * twr


def _kernel(xr_ref, xi_ref, or_ref, oi_ref, *, n, sign, scale):
    """Tall layout [n/128, 128]: sublane DIT chain + one lane-stage Gauss.

    Measured against the square [sqrt(n), sqrt(n)] layout (two sublane
    chains + in-VMEM transpose + split-table outer twiddle): the tall
    form is 1.17x faster at 2^20 (134 vs 157 us, scripts/probe_bigv2.py)
    and needs no transpose and no q/l twiddle split (k_s*m_l < n <= 2^21
    is f32-exact directly).  The lane-stage dot's result order [k_l, k_s]
    IS the natural output order, so the final reshape is free."""
    S = n // 128
    ar = xr_ref[0].reshape(S, 128)  # block (1, 1, n): [0] is (1, n)
    ai = xi_ref[0].reshape(S, 128)

    # stage 1: DFT_S down the sublane axis, natural order out
    br, bi = pf._dft_sublane_chain(ar, ai, S, sign,
                                   factors=_CHAIN_SCHEDULE.get(S))

    # inter-factor twiddle w_n^{k_s * m_l} (direct or factored — TW_FORM)
    cr, ci = _outer_twiddle_mul(br, bi, S, n, sign)

    # stage 2: contract the 128 lanes; [k_l, k_s] flattens to the natural
    # index X[k_s + S*k_l]; output scale folded into the stage matrix
    w2r, w2i = pf._gen_dft(128, 128, 128, sign, scale)
    dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))

    or_ref[0] = dr.reshape(1, n)
    oi_ref[0] = di.reshape(1, n)


def _supported(n: int) -> bool:
    if n < BIG_MIN_N or n > BIG_MAX_N or (n & (n - 1)):
        return False
    from . import pallas_fft as _pf

    try:
        pf._dit_schedule(n // 128)
    except Unsupported:
        return False
    return True


def _fft_big_core(re, im, sign, scale=None, *, interpret=False):
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside big-kernel envelope")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im
    # Batched rows (round 5): the old single-row restriction came from
    # 2-D [1, n] blocks over a multi-row array (block dim 1 is neither
    # divisible by 8 nor equal to the array dim).  A 3-D [rows, 1, n]
    # view sidesteps it — sublane/lane divisibility applies to the LAST
    # TWO dims only, and (1, n) there equals the array dims — so each
    # grid step owns one whole row.  Routed only below the measured
    # crossover (BATCHED_MAX_N, probe_r72): above it the four-step's
    # full-width batched passes win.
    if rows != 1 and n > BATCHED_MAX_N and not interpret:
        raise Unsupported(
            f"batched rows above n={BATCHED_MAX_N} lose to the four-step"
            " (probe_r72 crossover; 2^21 multi-row OOMs VMEM)")
    re3 = re.reshape(rows, 1, n)
    im3 = im.reshape(rows, 1, n)

    kern = functools.partial(
        _kernel, n=n, sign=sign,
        scale=float(scale) if scale is not None else 1.0,
    )
    spec = pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, 1, n), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (n // 128 // 32 + 128) * rows,
            bytes_accessed=4 * rows * n * 4,
            transcendentals=2 * n,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(re3, im3)
    return out_r.reshape(*lead, n), out_i.reshape(*lead, n)


# Autodiff: the transform is linear with a symmetric matrix, so the exact
# adjoint is the sign-flipped kernel; linear_call provides both jvp and
# vjp from it (see pallas_fft.py's AD section).
from jax import custom_derivatives as _cd


def fft_big_split(re, im, sign, scale=None, *, interpret=False):
    """Whole-row fused FFT over the last axis for 2^15 <= n <= 2^21.

    re/im: float32 [..., n]; returns the transform in natural order with
    input and output both flat (no HBM relayouts).  Differentiable both
    modes (exact linear adjoint: the sign-flipped kernel).
    """
    return _cd.linear_call(
        lambda _, lin: _fft_big_core(lin[0], lin[1], sign, scale,
                                     interpret=interpret),
        lambda _, ct: _fft_big_core(ct[0], ct[1], -sign, scale,
                                    interpret=interpret),
        (), (re, im))
