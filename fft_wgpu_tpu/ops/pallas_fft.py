"""Fused VMEM-resident batched FFT — the Pallas fast path.

TPU-native re-realization of the reference's production kernel
(fft_wgpu src/kernel/fft4.wgsl): where fft4 computes the *entire* transform
of one row per workgroup in a single dispatch (stage loop + barrier per
stage, fft4.wgsl:36-101), this kernel computes the entire transform of a
tile of rows per grid step with every intermediate resident in VMEM — one
HBM read and one HBM write per element, which is what pins the op to the
HBM-bandwidth roofline.

Algorithm: two-factor four-step with n = n1 * n2 (n2 = lane-width factor).
Per row-matrix A[n1, n2] (row-major view of the row):

    B  = W1 @ A              n1-point DFTs down the sublane axis   (MXU)
    C  = B * tw[k1, n2]      inter-factor twiddle                  (VPU)
    D  = C @ W2              n2-point DFTs along the lane axis     (MXU)
    out[k1 + n1*k2] = D[k1, k2]   i.e. flatten of D^T

The DFT matrices and twiddles are f64-generated host constants (cast f32),
mirroring the reference's host-side f64 twiddle precompute
(processor.rs:43-49) — but here they are baked into the executable rather
than bound as a storage buffer.  The inverse transform is the same kernel
with conjugated constants, and the 1/N normalization is *folded into the W2
matrix* — the TPU equivalent of fusing the divide into the last butterfly
stage (ifft.wgsl:65-74) at literally zero runtime cost.

Batch handling: rows are tiled onto the grid; within a tile the row-matrices
are stacked on the sublane axis so both matmuls run as single big MXU ops:

    stage 1: dot_general over the n1 axis of [bt, n1, n2]
    stage 2: reshape [bt*n1, n2] @ W2
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core import twiddle as _tw

__all__ = ["fft_batched_split", "Unsupported", "FUSED_MIN_N", "FUSED_MAX_N"]

FUSED_MIN_N = 256
FUSED_MAX_N = 4096  # 8192 compiles are not yet validated on hw; four-step covers beyond

def _default_row_tile(n: int) -> int:
    """Rows per grid step.

    Fixed at the 128-lane width: in the transposed (transform-along-
    sublanes) domain the batch sits in lanes, and Mosaic only supports the
    kernel's sublane<->flat shape casts when the lane dim is exactly a full
    vreg (128).  VMEM pressure is controlled by the n-envelope instead.
    """
    del n
    return 128

_MM_PREC = jax.lax.Precision.HIGHEST


class Unsupported(Exception):
    """Shape/dtype outside the fused kernel's envelope (caller falls back)."""


def _choose_split(n: int) -> tuple[int, int]:
    """n = n1 * n2 with n2 the lane factor: prefer n2 = 128, n1 = n // 128."""
    if n % 128 == 0 and n // 128 <= 128:
        return n // 128, 128
    # small powers of two (256 <= n < ... ) are covered above; generic:
    n1 = 1 << (int(math.log2(n)) // 2)
    return n1, n // n1


@functools.lru_cache(maxsize=None)
def _constants(n: int, sign: int, scale: float):
    """(W1r, W1i, twTr, twTi, W2r, W2i) numpy f32 constants for the kernel.

    Any output scale (1/N for the normalized inverse, 1/sqrt(N) for ortho)
    is folded into the last-stage DFT matrix in f64 — the zero-cost
    equivalent of the reference's fused last-stage divide (ifft.wgsl:65-74).
    """
    n1, n2 = _choose_split(n)
    w1 = _tw.dft_matrix_np(n1, sign, dtype=np.float64)
    tw = _tw.twiddle_np(n1, n2, sign, dtype=np.float64)  # [k1, n2]
    w2r, w2i = _tw.dft_matrix_np(n2, sign, dtype=np.float64)
    if scale != 1.0:
        w2r = w2r * scale
        w2i = w2i * scale
    f = lambda a: np.ascontiguousarray(a, dtype=np.float32)
    return f(w1[0]), f(w1[1]), f(tw[0]), f(tw[1]), f(w2r), f(w2i)


def _kernel(xr_ref, xi_ref, w1r_ref, w1i_ref, twr_ref, twi_ref, w2r_ref,
            w2i_ref, or_ref, oi_ref, *, n, n1, n2):
    """One row-tile, transform-along-sublanes dataflow.

    Mosaic constraint that shapes this kernel: vector shape casts may split
    and merge *sublane* (second-minor and higher) dims freely, but merging
    into the 128-wide lane dim is unsupported.  So the corner turns of the
    four-step run in the sublane domain: rows are transposed on entry
    ([bt, n] -> [n, bt], an XLU-supported 2D transpose), every
    reshape/matmul then touches only sublane dims, and the natural-order
    flatten X[k1 + n1*k2] = D[k1,k2] is a *sublane merge* [k2, k1, bt] ->
    [n, bt] — this is where the Stockham autosort reindexing of the
    reference (out = s*2J + j, fft4.wgsl:61-70) becomes a zero-cost
    relabeling instead of a scatter.
    """
    w1r, w1i = w1r_ref[:], w1i_ref[:]
    twr, twi = twr_ref[:], twi_ref[:]  # [k1, n2]
    w2r, w2i = w2r_ref[:], w2i_ref[:]
    bt = xr_ref.shape[0]

    # Corner turn: transform axis -> sublanes, batch rows -> lanes.
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    ai = xi_ref[:].T.reshape(n1, n2, bt)

    prec = dict(precision=_MM_PREC, preferred_element_type=jnp.float32)

    # ---- stage 1: B[k1, n2, b] = sum_m1 W1[k1, m1] A[m1, n2, b] (MXU) ----
    c0 = lambda w, x: jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())), **prec)
    br = c0(w1r, ar) - c0(w1i, ai)
    bi = c0(w1i, ar) + c0(w1r, ai)

    # ---- twiddle tw[k1, n2] broadcast over the lane (batch) axis (VPU) ----
    twr3 = twr[:, :, None]
    twi3 = twi[:, :, None]
    cr = br * twr3 - bi * twi3
    ci = br * twi3 + bi * twr3

    # ---- stage 2: D[k2, k1, b] = sum_m2 W2[k2, m2] C[k1, m2, b] (MXU) ----
    c1 = lambda w, x: jax.lax.dot_general(w, x, (((1,), (1,)), ((), ())), **prec)
    dr = c1(w2r, cr) - c1(w2i, ci)  # [k2, k1, b]
    di = c1(w2i, cr) + c1(w2r, ci)

    # Natural order: flat k = k1 + n1*k2 == C-order flatten of [k2, k1].
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


# Largest n for the simple whole-block kernel: beyond this the doubled-up
# VMEM blocks (Pallas auto double-buffering of 4 IO blocks + intermediates)
# blow the ~16 MiB budget; the streaming kernel takes over.
_SIMPLE_MAX_N = 1024
# Lane chunk for the streaming kernel's DMA+transpose pipeline.
_STREAM_CHUNK = 512


def _supported(shape, n) -> bool:
    if n < FUSED_MIN_N or n > FUSED_MAX_N:
        return False
    if n & (n - 1):
        return False
    if n % 128 != 0 or n // 128 > 128:
        return False
    return True


def _stream_kernel(xr_hbm, xi_hbm, w1r_ref, w1i_ref, twr_ref, twi_ref,
                   w2r_ref, w2i_ref, or_hbm, oi_hbm,
                   xtr, xti, inbr, inbi, outbr, outbi,
                   in_sems, out_sems, *, n, n1, n2, ch, io_only=False):
    """Streaming variant for n beyond the whole-block VMEM envelope.

    IO arrays stay in HBM; each grid step owns a 128-row stripe.  Input is
    DMA'd in [128, ch] lane-chunks (double-buffered), corner-turned by 2D
    transpose into the VMEM-resident transposed plane [n, 128], transformed
    with the same sublane-domain four-step as `_kernel`, and streamed back
    out through transposing chunk DMAs.  This replaces Pallas's automatic
    block pipeline with a hand-rolled one so only ~3 [n, 128] planes (per
    re/im) are ever live — the TPU counterpart of the reference's strategy
    split between the fused fft4.wgsl kernel and the per-stage streaming
    ifft.wgsl path (SURVEY §3.2).
    """
    rc = pl.program_id(0)
    base = rc * 128
    nch = n // ch
    rows_per_chunk = ch // n2  # n1-rows covered by one flat [ch, 128] chunk
    chk2 = ch // n1            # k2 values per fused stage-2/output chunk
    chn2 = min(32, n2)         # n2 slab width for the in-place stage 1

    prec = dict(precision=_MM_PREC, preferred_element_type=jnp.float32)
    c0 = lambda w, x: jax.lax.dot_general(w, x, (((1,), (0,)), ((), ())), **prec)
    c1 = lambda w, x: jax.lax.dot_general(w, x, (((1,), (1,)), ((), ())), **prec)

    def in_dma(slot, c, plane, buf, psem):
        return pltpu.make_async_copy(
            plane.at[pl.ds(base, 128), pl.ds(c * ch, ch)],
            buf.at[slot],
            in_sems.at[psem, slot],
        )

    def out_dma(slot, c, buf, plane, psem):
        return pltpu.make_async_copy(
            buf.at[slot],
            plane.at[pl.ds(base, 128), pl.ds(c * ch, ch)],
            out_sems.at[psem, slot],
        )

    # ---- load + corner-turn input (double-buffered; static chunk loop) ----
    # xtr/xti are [n1, n2, 128] planes; a flat [ch, 128] transposed chunk is
    # `rows_per_chunk` whole n1-rows (ch is a multiple of n2).
    in_dma(0, 0, xr_hbm, inbr, 0).start()
    in_dma(0, 0, xi_hbm, inbi, 1).start()
    for c in range(nch):
        slot = c % 2
        if c + 1 < nch:
            in_dma(1 - slot, c + 1, xr_hbm, inbr, 0).start()
            in_dma(1 - slot, c + 1, xi_hbm, inbi, 1).start()
        in_dma(slot, c, xr_hbm, inbr, 0).wait()
        in_dma(slot, c, xi_hbm, inbi, 1).wait()
        r0 = c * rows_per_chunk
        xtr[r0:r0 + rows_per_chunk] = inbr[slot].T.reshape(
            rows_per_chunk, n2, 128
        )
        xti[r0:r0 + rows_per_chunk] = inbi[slot].T.reshape(
            rows_per_chunk, n2, 128
        )

    w1r, w1i = w1r_ref[:], w1i_ref[:]
    w2r, w2i = w2r_ref[:], w2i_ref[:]

    # ---- stage 1 + twiddle, IN PLACE in n2-slabs (keeps one plane live) ---
    # For each n2 slab: B = W1 @ A over the n1 axis, then the inter-factor
    # twiddle; the slab of xt is overwritten with C.
    for s in range(0 if io_only else n2 // chn2):
        sl = slice(s * chn2, (s + 1) * chn2)
        vr = xtr[:, sl, :]
        vi = xti[:, sl, :]
        br = c0(w1r, vr) - c0(w1i, vi)
        bi = c0(w1i, vr) + c0(w1r, vi)
        tr = twr_ref[:, sl][:, :, None]
        ti = twi_ref[:, sl][:, :, None]
        xtr[:, sl, :] = br * tr - bi * ti
        xti[:, sl, :] = br * ti + bi * tr

    # ---- stage 2 fused with the output stream: k2-chunked DFT over n2 ----
    # D[k2, k1, b] rows for a k2-chunk are exactly the next `ch` flat output
    # rows (k = k1 + n1*k2), so each chunk goes straight through the
    # transposing store DMA. Only [chk2, n1, 128]-sized temporaries exist.
    cr_all = xtr[:]
    ci_all = xti[:]
    for c in range(nch):
        slot = c % 2
        k2sl = slice(c * chk2, (c + 1) * chk2)
        if io_only:  # debug: skip the DFT math, keep the full IO path
            dr2 = cr_all.reshape(n, 128)[c * ch:(c + 1) * ch]
            di2 = ci_all.reshape(n, 128)[c * ch:(c + 1) * ch]
        else:
            dr = c1(w2r[k2sl], cr_all) - c1(w2i[k2sl], ci_all)  # [chk2,n1,128]
            di = c1(w2i[k2sl], cr_all) + c1(w2r[k2sl], ci_all)
            dr2 = dr.reshape(ch, 128)
            di2 = di.reshape(ch, 128)
        if c >= 2:  # slot reuse: previous DMA from this slot must be done
            out_dma(slot, c - 2, outbr, or_hbm, 0).wait()
            out_dma(slot, c - 2, outbi, oi_hbm, 1).wait()
        outbr[slot] = dr2.T
        outbi[slot] = di2.T
        out_dma(slot, c, outbr, or_hbm, 0).start()
        out_dma(slot, c, outbi, oi_hbm, 1).start()
    for c in (nch - 2, nch - 1):
        if c >= 0:
            slot = c % 2
            out_dma(slot, c, outbr, or_hbm, 0).wait()
            out_dma(slot, c, outbi, oi_hbm, 1).wait()


def fft_batched_split(re, im, sign, scale=None, *, row_tile=None, interpret=False,
                      io_only=False):
    """Batched FFT over the last axis via the fused Pallas kernel.

    re/im: float32 [..., n] (any leading dims; flattened to a row batch).
    sign: -1 forward / +1 inverse; scale: None or 1/n (folded into W2).
    """
    n = re.shape[-1]
    if not _supported(re.shape, n):
        raise Unsupported(f"n={n} outside fused kernel envelope")

    lead = re.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    re2 = re.reshape(rows, n)
    im2 = im.reshape(rows, n)

    bt = row_tile or _default_row_tile(n)
    pad = (-rows) % bt
    if pad:
        re2 = jnp.pad(re2, ((0, pad), (0, 0)))
        im2 = jnp.pad(im2, ((0, pad), (0, 0)))
    padded_rows = rows + pad

    n1, n2 = _choose_split(n)
    consts = _constants(n, sign, float(scale) if scale is not None else 1.0)

    grid = (padded_rows // bt,)

    def _const_spec(arr):
        # Whole-table block with a grid-invariant index map: DMA'd into VMEM
        # once and reused by every grid step.
        return pl.BlockSpec(arr.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    const_arrays = [jnp.asarray(c) for c in consts]
    flops_per_row = 8 * n * (n1 + n2) + 6 * n
    out_shape = [
        jax.ShapeDtypeStruct((padded_rows, n), jnp.float32),
        jax.ShapeDtypeStruct((padded_rows, n), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=flops_per_row * padded_rows,
        bytes_accessed=4 * padded_rows * n * 4,
        transcendentals=0,
    )

    if n <= _SIMPLE_MAX_N:
        kern = functools.partial(_kernel, n=n, n1=n1, n2=n2)
        spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
        out_r, out_i = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec, spec] + [_const_spec(c) for c in const_arrays],
            out_specs=[spec, spec],
            out_shape=out_shape,
            cost_estimate=cost,
            interpret=interpret,
        )(re2, im2, *const_arrays)
    else:
        ch = min(_STREAM_CHUNK, n)
        kern = functools.partial(
            _stream_kernel, n=n, n1=n1, n2=n2, ch=ch, io_only=io_only
        )
        any_spec = pl.BlockSpec(memory_space=pltpu.MemorySpace.ANY)
        out_r, out_i = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[any_spec, any_spec]
            + [_const_spec(c) for c in const_arrays],
            out_specs=[any_spec, any_spec],
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((n1, n2, 128), jnp.float32),  # xtr
                pltpu.VMEM((n1, n2, 128), jnp.float32),  # xti
                pltpu.VMEM((2, 128, ch), jnp.float32),  # inbr
                pltpu.VMEM((2, 128, ch), jnp.float32),  # inbi
                pltpu.VMEM((2, 128, ch), jnp.float32),  # outbr
                pltpu.VMEM((2, 128, ch), jnp.float32),  # outbi
                pltpu.SemaphoreType.DMA((2, 2)),     # in_sems [plane, slot]
                pltpu.SemaphoreType.DMA((2, 2)),     # out_sems
            ],
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(re2, im2, *const_arrays)

    if pad:
        out_r = out_r[:rows]
        out_i = out_i[:rows]
    return out_r.reshape(*lead, n), out_i.reshape(*lead, n)
