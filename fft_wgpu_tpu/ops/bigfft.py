"""Single-pass fused large-N FFT: the whole row resident in VMEM.

The reference streams one radix-2 stage per dispatch through global memory
for ANY length (fft_wgpu src/processor.rs:327-330 — log2(n) HBM round
trips); round 1 replaced that with a two-pass HBM four-step
(ops/fourstep.py).  This kernel goes one further for rows that fit VMEM
(2^15 <= n <= ~2^21): ONE HBM read and ONE write per element — the same
single-round-trip property the fused row kernel has for n <= 16384 —
by running the entire four-step in VMEM:

    x[1, n] --free view--> A[n1, n2]        (minor stays n2, a lane multiple)
    1. B  = DFT_n1 over the SUBLANE axis    (factored MXU stages, in place)
    2. C  = B * tw[k1, m2]                  (outer twiddle, split q/l tables)
    3. Ct = C^T                             (one in-VMEM transpose; probed
                                             nearly free on v5e)
    4. D  = DFT_n2 over the SUBLANE axis    (output scale folded here)
    5. out[1, n] = D.reshape(n)             (free sublane merge: natural
                                             order X[k1 + n1*k2] = D[k2, k1])

Both input and output stay FLAT [rows, n] — there is no HBM-level
[.., n] <-> [.., n1, n2] reshape, which on TPU is a physical relayout that
cost the two-pass four-step ~60 us/call (PERFORMANCE.md).

Sublane-axis DFTs are factored into full-MXU-rate atoms only (measured on
v5e: [64,64]/[128,128]-shaped dots run at the f32 MAC-rate; [32,32]-class
Gauss dots do not — scripts/probe_r2.py):

    factor 32   -> real-matrix single dot, wbig [64, 64]
    factor 64   -> real-matrix single dot, wbig [128, 128]
    factor 128  -> Gauss 3-mult, three [128,128] dots
    factor 2/4/8 (schedule tails) -> unrolled VPU butterflies (adds and
    trace-time-constant rotations; no MXU pass at all)

Outer twiddle exactness: exp(sign*2pi*i*k1*m2/n) needs k1*m2 < 2^24 for
exact f32 index math, which fails beyond n ~ 2^12 squared; the plane is
generated as a product of two small tables over m2 = 128*q + l, keeping
every index product <= 2^18 (exact).
"""

from __future__ import annotations

import functools
import math

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


def _schedule(S: int):
    """Factor a sublane DFT size into (small_vpu_factor, mxu_factors...).

    The FIRST factor is the contraction over the major (outermost) index of
    the four-step view, so the VPU tail factor leads; MXU factors are
    restricted to the measured full-rate atoms {32, 64, 128}.
    """
    e = S.bit_length() - 1
    assert (1 << e) == S
    if S == 128:
        return (128,)
    if S == 256:
        return (4, 64)
    if S == 512:
        return (8, 64)
    if S == 1024:
        return (32, 32)
    if S == 2048:
        return (32, 64)
    if S == 4096:
        return (64, 64)
    raise Unsupported(f"no sublane DFT schedule for S={S}")


def _vpu_dft_lead(xr, xi, f: int, sign: int):
    """DFT of size f (<= 8) over the LEADING sublane axis, fully unrolled:
    trace-time-constant unit-root coefficients, adds + a few rotations on
    the VPU — zero MXU passes (the roots of unity for f in {2,4,8} are
    mostly +-1 / +-i)."""
    outs_r, outs_i = [], []
    for k in range(f):
        ar = ai = None
        for j in range(f):
            c = math.cos(sign * 2.0 * math.pi * k * j / f)
            s = math.sin(sign * 2.0 * math.pi * k * j / f)
            # (c + i s) * (xr[j] + i xi[j]); skip exact-zero terms
            if abs(c) < 1e-12:
                tr = -s * xi[j]
                ti = s * xr[j]
            elif abs(s) < 1e-12:
                tr = c * xr[j] if c != 1.0 else xr[j]
                ti = c * xi[j] if c != 1.0 else xi[j]
            else:
                tr = c * xr[j] - s * xi[j]
                ti = c * xi[j] + s * xr[j]
            ar = tr if ar is None else ar + tr
            ai = ti if ai is None else ai + ti
        outs_r.append(ar[None])
        outs_i.append(ai[None])
    return jnp.concatenate(outs_r, 0), jnp.concatenate(outs_i, 0)


def _sublane_dft(xr, xi, S: int, sign: int, scale: float):
    """DFT of size S over the leading sublane axis of [S, ...lanes],
    natural output order, `scale` folded into the final stage's matrix."""
    a_b = _schedule(S)
    if len(a_b) == 1:  # single Gauss stage (S == 128)
        wr, wi = pf._gen_dft(S, S, S, sign, scale)
        return pf._cdot(wr, wr + wi, wi - wr, xr, xi, ((1,), (0,)))

    a, b = a_b
    rest = xr.shape[1:]
    xr = xr.reshape(a, b, *rest)
    xi = xi.reshape(a, b, *rest)

    # stage 1: contract the major factor a (dim 0) -> [ka, b, ...]
    if a <= 8:
        br, bi = _vpu_dft_lead(xr, xi, a, sign)
    elif 2 * a <= 128:
        br, bi = pf._cdot_realcat(a, sign, xr, xi, 0, ((1,), (0,)))
    else:
        wr, wi = pf._gen_dft(a, a, a, sign)
        br, bi = pf._cdot(wr, wr + wi, wi - wr, xr, xi, ((1,), (0,)))

    # inter-factor twiddle tw_S[ka, mb] (index products < S <= 4096: exact)
    twr, twi = pf._gen_twiddle(a, b, S, sign)
    bc = (a, b) + (1,) * len(rest)
    twr = twr.reshape(bc)
    twi = twi.reshape(bc)
    cr = br * twr - bi * twi
    ci = br * twi + bi * twr

    # stage 2: contract factor b (dim 1) -> [kb, ka, ...]; scale folded
    if 2 * b <= 128 and scale == 1.0:
        dr, di = pf._cdot_realcat(b, sign, cr, ci, 1, ((1,), (1,)))
    else:
        w2r, w2i = pf._gen_dft(b, b, b, sign, scale)
        if 2 * b <= 128:
            wbig = jnp.concatenate(
                [jnp.concatenate([w2r, -w2i], axis=1),
                 jnp.concatenate([w2i, w2r], axis=1)], axis=0)
            xcat = jnp.concatenate([cr, ci], axis=1)
            res = jax.lax.dot_general(
                wbig, xcat, ((((1,), (1,))), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            dr, di = res[:b], res[b:]
        else:
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    # [kb, ka, ...] --sublane merge--> [S, ...] is the natural order
    return dr.reshape(S, *rest), di.reshape(S, *rest)


def _outer_twiddle(yr, yi, n1: int, n2: int, n: int, sign: int):
    """Apply tw[k1, m2] = exp(sign*2pi*i*k1*m2/n) to [n1, n2] via the
    m2 = 128*q + l split: tw = t1[k1, q] * t2[k1, l], every index product
    f32-exact (<= 2^18 for n <= 2^22)."""
    Q = n2 // 128
    k = jax.lax.broadcasted_iota(jnp.int32, (n1, Q), 0).astype(jnp.float32)
    q = jax.lax.broadcasted_iota(jnp.int32, (n1, Q), 1).astype(jnp.float32)
    period = n // 128  # exp(i*2pi*128*k*q/n) has period n/128 in k*q
    t = k * q
    r = t - period * jnp.floor(t / period)
    th1 = (sign * 2.0 * math.pi * 128.0 / n) * r
    t1r, t1i = jnp.cos(th1), jnp.sin(th1)

    k = jax.lax.broadcasted_iota(jnp.int32, (n1, 128), 0).astype(jnp.float32)
    l = jax.lax.broadcasted_iota(jnp.int32, (n1, 128), 1).astype(jnp.float32)
    t = k * l
    r = t - n * jnp.floor(t / n)
    th2 = (sign * 2.0 * math.pi / n) * r
    t2r, t2i = jnp.cos(th2), jnp.sin(th2)

    twr = t1r[:, :, None] * t2r[:, None, :] - t1i[:, :, None] * t2i[:, None, :]
    twi = t1r[:, :, None] * t2i[:, None, :] + t1i[:, :, None] * t2r[:, None, :]

    y3r = yr.reshape(n1, Q, 128)
    y3i = yi.reshape(n1, Q, 128)
    cr = y3r * twr - y3i * twi
    ci = y3r * twi + y3i * twr
    return cr.reshape(n1, n2), ci.reshape(n1, n2)


def _kernel(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale):
    ar = xr_ref[0].reshape(n1, n2)  # lane->sublane split: free (n2 % 128 == 0)
    ai = xi_ref[0].reshape(n1, n2)

    br, bi = _sublane_dft(ar, ai, n1, sign, 1.0)      # DFT over columns
    cr, ci = _outer_twiddle(br, bi, n1, n2, n, sign)  # four-step twiddle
    ctr, cti = cr.T, ci.T                             # one in-VMEM transpose
    dr, di = _sublane_dft(ctr, cti, n2, sign, scale)  # DFT over (old) rows

    or_ref[0] = dr.reshape(n)  # [k2, k1] -> flat k1 + n1*k2: natural order
    oi_ref[0] = di.reshape(n)


def _choose_split(n: int) -> tuple[int, int]:
    e = n.bit_length() - 1
    n1 = 1 << (e // 2)
    return n1, n // n1


def _supported(n: int) -> bool:
    if n < BIG_MIN_N or n > BIG_MAX_N or (n & (n - 1)):
        return False
    n1, n2 = _choose_split(n)
    try:
        _schedule(n1), _schedule(n2)
    except Unsupported:
        return False
    return True


def fft_big_split(re, im, sign, scale=None, *, interpret=False):
    """Whole-row fused FFT over the last axis for 2^15 <= n <= 2^21.

    re/im: float32 [..., n]; returns the transform in natural order with
    input and output both flat (no HBM relayouts).
    """
    n = re.shape[-1]
    if not _supported(n):
        raise Unsupported(f"n={n} outside big-kernel envelope")
    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    if rows == 0:
        return re, im
    if rows != 1 and not interpret:
        # Pallas requires block dims divisible by 8 (sublane) or equal to the
        # array dim; a [1, n] block over a multi-row array is neither, and
        # [8, n] blocks exceed VMEM at these n.  Batched large-N rows take
        # the two-pass four-step instead (probe_bigfft.py r2 findings).
        raise Unsupported("big kernel is single-row; batched large-N uses "
                          "the four-step path")
    re2 = re.reshape(rows, n)
    im2 = im.reshape(rows, n)

    n1, n2 = _choose_split(n)
    kern = functools.partial(
        _kernel, n=n, n1=n1, n2=n2, sign=sign,
        scale=float(scale) if scale is not None else 1.0,
    )
    spec = pl.BlockSpec((1, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(rows,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((rows, n), jnp.float32),
            jax.ShapeDtypeStruct((rows, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=8 * n * (n1 + n2) * rows,
            bytes_accessed=4 * rows * n * 4,
            transcendentals=2 * (n1 * n2 // 128 + n1 * 128),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024,
        ),
        interpret=interpret,
    )(re2, im2)
    return out_r.reshape(*lead, n), out_i.reshape(*lead, n)
