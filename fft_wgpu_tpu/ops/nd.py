"""Multi-dimensional C2C transforms (row-column decomposition).

The reference is strictly 1-D (SURVEY §1); 2-D/3-D are new capabilities
required by BASELINE.json config 4/5.  N-D = separable application of the
1-D executor along each axis; the per-axis executor choice (Pallas fused /
XLA mixed-radix) is delegated to the plan layer, and the whole N-D pipeline
traces into one jitted program, so XLA owns the inter-axis transposes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core.complex_utils import merge, promote_to_split
from ..core.twiddle import FORWARD, INVERSE

__all__ = ["fft2", "ifft2", "fftn", "ifftn", "fftn_split"]


def _norm_axes(ndim, s, axes):
    if axes is None:
        if s is not None and len(s) > ndim:
            # numpy maps s to the LAST len(s) axes; more entries than
            # dims is an out-of-range axis there, not a silent wrap
            raise ValueError(
                f"shape requires {len(s)} axes but input has {ndim} "
                f"dimensions")
        axes = list(range(ndim)) if s is None else list(range(ndim - len(s), ndim))
    for a in axes:
        if not -ndim <= a < ndim:
            raise ValueError(
                f"axis {a} is out of bounds for array of dimension {ndim}")
    axes = [a % ndim for a in axes]
    if s is None:
        s = [None] * len(axes)
    if len(s) != len(axes):
        raise ValueError("s and axes must have the same length")
    return list(s), axes


def fftn_split(re, im, axes, sign, scale, executor="auto"):
    """Apply the 1-D executor along each axis; scale applied once at the end."""
    import jax as _jax

    from ..plan.plan import get_plan

    # TPU fast paths for a trailing-2D block:
    #  * batched planes (>= 8 rows: the grid pipelines DMA with compute)
    #    in the fused-plane envelope run BOTH axes in one VMEM residency
    #    (pallas_fft.fft2_fused_split — one HBM round trip instead of
    #    two); a 3-D transform then costs 2 round trips total.
    #  * otherwise two transposed-rows passes with zero explicit
    #    transposes (pallas_fft.fft2_split).
    nd = re.ndim
    ax_sorted = sorted(a % nd for a in axes)
    if (
        executor in ("auto", "pallas")
        and _jax.default_backend() == "tpu"
        and len(axes) >= 2
        and ax_sorted[-2:] == [nd - 2, nd - 1]
    ):
        try:
            from . import pallas_fft
        except ImportError:
            pallas_fft = None
        if pallas_fft is not None:
            rest = ax_sorted[:-2]
            lead_rows = math.prod(re.shape[:-2])
            re2 = im2 = None
            if lead_rows >= 8 or rest:
                try:
                    re2, im2 = pallas_fft.fft2_fused_split(
                        re, im, sign, scale if not rest else None)
                except pallas_fft.Unsupported:
                    re2 = None
            if re2 is None and not rest:
                try:
                    return pallas_fft.fft2_split(re, im, sign, scale)
                except pallas_fft.Unsupported:
                    pass
            if re2 is not None:
                if not rest:
                    return re2, im2
                # fused plane done; fall through to the generic per-axis
                # loop for the remaining axes (scale applied there)
                re, im = re2, im2
                axes = rest

    for ax in axes:
        # the plan layer picks the right executor per axis; axis -2 runs
        # the transpose-free sublane-domain kernel with no data movement
        p = get_plan(re.shape[ax], executor)
        re, im = p._execute_split_axis(re, im, sign, None, ax)
    if scale is not None and scale != 1.0:
        s = jnp.float32(scale)
        re, im = re * s, im * s
    return re, im


def _run_nd(x, s, axes, sign, norm, executor):
    re, im = promote_to_split(x)
    s, axes = _norm_axes(re.ndim, s, axes)
    # numpy semantics: s trims/pads each axis
    for size, ax in zip(s, axes):
        if size is not None and re.shape[ax] != size:
            cur = re.shape[ax]
            if cur > size:
                idx = [slice(None)] * re.ndim
                idx[ax] = slice(0, size)
                re, im = re[tuple(idx)], im[tuple(idx)]
            else:
                pad = [(0, 0)] * re.ndim
                pad[ax] = (0, size - cur)
                re, im = jnp.pad(re, pad), jnp.pad(im, pad)

    total = math.prod(re.shape[a] for a in axes)
    if norm in (None, "backward"):
        scale = None if sign == FORWARD else 1.0 / total
    elif norm == "ortho":
        scale = total**-0.5
    elif norm == "forward":
        scale = 1.0 / total if sign == FORWARD else None
    else:
        raise ValueError(f"invalid norm {norm!r}")

    from ..utils.jit_cache import cached_call, shape_key

    key = ("nd", jax.default_backend(), shape_key(re), tuple(axes),
           sign, scale, executor)
    return cached_call(
        key,
        lambda r, i: merge(*fftn_split(r, i, tuple(axes), sign, scale,
                                       executor)),
        re, im)


def fftn(x, s=None, axes=None, norm=None, *, executor: str = "auto"):
    """N-D forward C2C FFT (numpy.fft.fftn semantics)."""
    return _run_nd(x, s, axes, FORWARD, norm, executor)


def ifftn(x, s=None, axes=None, norm=None, *, executor: str = "auto"):
    """N-D inverse C2C FFT (numpy.fft.ifftn semantics)."""
    return _run_nd(x, s, axes, INVERSE, norm, executor)


def fft2(x, s=None, axes=(-2, -1), norm=None, *, executor: str = "auto"):
    """2-D forward FFT over `axes` (default last two)."""
    return _run_nd(x, s, list(axes), FORWARD, norm, executor)


def ifft2(x, s=None, axes=(-2, -1), norm=None, *, executor: str = "auto"):
    """2-D inverse FFT over `axes` (default last two)."""
    return _run_nd(x, s, list(axes), INVERSE, norm, executor)
