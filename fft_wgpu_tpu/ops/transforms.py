"""Functional FFT API (numpy.fft-compatible surface over the plan layer).

Module-level `fft`/`ifft` etc. are thin wrappers that pull a cached
:class:`~fft_wgpu_tpu.plan.plan.Plan` and execute it — "plan once, run many"
exactly like the reference's constructed-once `Forward`/`Inverse` objects
replayed per frame (fft_wgpu examples/basic.rs:66-127).

`norm` follows numpy.fft: None/"backward" (ifft scales 1/N — the reference's
default, ifft.wgsl:65-74), "ortho" (1/sqrt(N) both ways), "forward".
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..core.complex_utils import promote_to_split
from ..core.twiddle import FORWARD, INVERSE
from ..plan.plan import get_plan

__all__ = ["fft", "ifft", "ifft_unnormalized", "normalize"]


def _norm_scales(n: int, norm):
    if norm in (None, "backward"):
        return None, 1.0 / n
    if norm == "ortho":
        s = 1.0 / math.sqrt(n)
        return s, s
    if norm == "forward":
        return 1.0 / n, None
    raise ValueError(f"invalid norm {norm!r}")


def _run_1d(x, n, axis, sign, scale, executor):
    re, im = promote_to_split(x)
    if n is not None and re.shape[axis] != n:
        re, im = _pad_or_trim(re, im, n, axis)
    length = re.shape[axis]
    p = get_plan(length, executor)
    return p._jitted(axis, sign, scale)(re, im)


def _pad_or_trim(re, im, n, axis):
    cur = re.shape[axis]
    if cur > n:
        sl = [slice(None)] * re.ndim
        sl[axis] = slice(0, n)
        return re[tuple(sl)], im[tuple(sl)]
    pad = [(0, 0)] * re.ndim
    pad[axis] = (0, n - cur)
    return jnp.pad(re, pad), jnp.pad(im, pad)


def fft(x, n=None, axis: int = -1, norm=None, *, executor: str = "auto"):
    """1-D C2C forward FFT along `axis` (reference Forward, processor.rs:7-159)."""
    fscale, _ = _norm_scales(n or jnp.shape(x)[axis], norm)
    return _run_1d(x, n, axis, FORWARD, fscale, executor)


def ifft(x, n=None, axis: int = -1, norm=None, *, executor: str = "auto"):
    """1-D C2C inverse FFT, scaled per `norm` (reference Inverse with fused
    1/N, processor.rs:231-341)."""
    _, iscale = _norm_scales(n or jnp.shape(x)[axis], norm)
    return _run_1d(x, n, axis, INVERSE, iscale, executor)


def ifft_unnormalized(x, n=None, axis: int = -1, *, executor: str = "auto"):
    """Unnormalized inverse FFT (reference Onlyinverse, processor.rs:566-670).
    Compose with :func:`normalize` for the two-pass flow the reference
    demonstrates in examples/basic_inverse2.rs:85-92."""
    return _run_1d(x, n, axis, INVERSE, None, executor)


def normalize(x, n=None, axis: int = -1):
    """Standalone 1/N scale (reference Normalize, normalize.wgsl:10-11)."""
    length = n if n is not None else jnp.shape(x)[axis]
    return get_plan(length, "auto").normalize(x, axis=axis)
