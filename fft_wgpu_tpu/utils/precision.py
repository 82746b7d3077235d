"""Global dot-precision control for the TPU kernels.

Every DFT stage in this framework is a constant-matrix matmul on the
MXU.  At the default "accurate" setting those dots run at
`Precision.HIGHEST` (6 bf16 passes per real matmul — the only
f32-accurate mode Mosaic offers; ~2e-7 rel error).  The measured
compute bounds in BENCH/PERFORMANCE show the SAME kernels at DEFAULT
(one bf16 pass) run 1.2-1.5x faster — e.g. the 4096x4096 headline
0.611 -> 0.513 ms, 2-D 1.184 -> 0.867, 3-D 256^3 1.671 -> 1.104 —
at ~3e-3 relative accuracy, which many ML/serving workloads (spectral
convolutions in FNO-style models, feature extraction) happily accept.
"fast" makes that trade a one-line opt-in.

Reference anchor: the reference has no precision control at all (f32
WGSL throughout, fft_wgpu src/kernel/fft.wgsl); on TPU the MXU's
native bf16 granularity makes precision a first-class scheduling knob
(PERFORMANCE.md round-2b pass-count line).
"""

from __future__ import annotations

from contextlib import contextmanager

import jax

__all__ = ["set_dot_precision", "get_dot_precision", "dot_precision"]

_MODES = {
    "accurate": jax.lax.Precision.HIGHEST,  # 6 bf16 passes, ~2e-7 rel
    "fast": jax.lax.Precision.DEFAULT,      # 1 bf16 pass,  ~3e-3 rel
}
_current = "accurate"


def set_dot_precision(mode: str) -> None:
    """Set the MXU dot precision for ALL subsequent transforms.

    mode: "accurate" (default; f32-grade, Precision.HIGHEST) or "fast"
    (one bf16 pass per dot; 1.2-1.5x faster kernels at ~3e-3 rel).

    Takes effect for everything traced after the call: already-compiled
    executables are flushed (jax.clear_caches + the plan cache), so
    switching mid-process retraces — call it once up front in serving
    code.
    """
    global _current
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}, got "
                         f"{mode!r}")
    from ..ops import pallas_fft as pf
    from ..ops import stockham as st

    pf._MM_PREC = _MODES[mode]
    st._DOT_PREC = _MODES[mode]
    _current = mode
    jax.clear_caches()
    from ..plan.plan import get_plan

    get_plan.cache_clear()


def get_dot_precision() -> str:
    """Current mode name ("accurate" | "fast")."""
    return _current


@contextmanager
def dot_precision(mode: str):
    """Context manager form of set_dot_precision (restores on exit).

    Note the cache flush on entry AND exit: use for whole workloads,
    not per-call toggling.
    """
    prev = _current
    set_dot_precision(mode)
    try:
        yield
    finally:
        set_dot_precision(prev)
