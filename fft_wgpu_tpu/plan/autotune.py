"""Measured executor selection — the FFTW_MEASURE analogue for plans.

The reference constructs its plan objects with a fixed kernel strategy
per entry point (fft_wgpu src/processor.rs:19-108); FFTW-style planners
instead MEASURE candidate schedules and keep the winner.  `plan(n,
autotune=True)` does that here: each (n, batch-rows, axis) is timed once
per process across the executor candidates valid for the shape, and the
fastest becomes the plan's executor for matching calls.

Timing discipline (remote-tunnel safe, see CLAUDE.md): a device-side
`fori_loop` chain executed at two different lengths, scalar readback, and
the per-iteration cost taken from the SLOPE — per-call dispatch latency
(~30 ms on tunnels) cancels exactly.  Candidates compile once each; with
the persistent compilation cache enabled this is cheap on re-runs.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

__all__ = ["candidates_for", "measure_executor", "TUNE_CACHE",
           "load_wisdom", "save_wisdom"]

# (backend, n, rows_bucket, axis) -> executor name
TUNE_CACHE: dict = {}

_WISDOM_PATH = os.path.expanduser("~/.cache/fft_wgpu_tpu_wisdom.json")
_wisdom_loaded = False


def _bucket(rows: int) -> int:
    """Row-count regime bucket: the executor ranking is stable within
    these (kernel tiles are 128 rows; <16 rows is the padding-dominated
    regime where XLA can win)."""
    if rows < 16:
        return 8
    if rows < 128:
        return 64
    return 1024


def load_wisdom(path: str = _WISDOM_PATH) -> None:
    """Load persisted tuning decisions (FFTW-wisdom analogue).  Called
    lazily by measure_executor; safe to call again after clearing."""
    global _wisdom_loaded
    _wisdom_loaded = True
    try:
        with open(path) as f:
            data = json.load(f)
        for k, v in data.items():
            backend, n, rows_b, axis = k.split("|")
            TUNE_CACHE[(backend, int(n), int(rows_b), int(axis))] = v
    except (OSError, ValueError):
        pass


def save_wisdom(path: str = _WISDOM_PATH) -> None:
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        data = {"|".join(map(str, k)): v for k, v in TUNE_CACHE.items()}
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, path)
    except OSError:
        pass


def candidates_for(n: int, rows: int, backend: str) -> list[str]:
    """Executor candidates worth measuring for this shape.

    Stays within measured-sane strategies (PERFORMANCE.md): the fused
    Pallas kernels for in-envelope power-of-two rows (classic two-factor
    vs the DIT chain schedule), bigfft/fourstep beyond VMEM, XLA
    elsewhere (and for tiny batches, where kernel tiles are padding).
    """
    from ..ops import bigfft
    from ..ops import pallas_fft as pf

    pow2 = n > 0 and (n & (n - 1)) == 0
    if backend != "tpu" or not pow2:
        return ["xla"]
    cands: list[str] = []
    if pf.FUSED_MIN_N <= n <= pf.FUSED_MAX_N and n % 128 == 0:
        cands.append("pallas:classic")
        if n in pf._BALANCED:
            cands.append("pallas:balanced")
        if n >= pf._DIT_MIN_N:
            cands.append("pallas:dit")
        if rows < 128:
            cands.append("xla")
    elif n > pf.FUSED_MAX_N:
        if rows == 1 and bigfft._supported(n):
            cands.append("bigfft")
        cands.append("fourstep")
    if not cands:
        cands.append("xla")
    return cands


def _slope_time(fn_split, shape, repeats=2) -> float:
    """Per-iteration device time of `fn_split(re, im) -> (re, im)` via a
    two-length chained fori_loop — dispatch latency (~30 ms on remote
    tunnels) cancels in the slope.  Chain lengths scale up adaptively
    until the slope window is well above dispatch jitter, so small
    workloads don't mis-rank."""
    re = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)

    @jax.jit
    def run(a, b, k):
        def body(_, c):
            return tuple(fn_split(c[0], c[1]))

        a, b = jax.lax.fori_loop(0, k, body, (a, b))
        return jnp.sum(a[..., 0]) + jnp.sum(b[..., 0])

    _ = float(run(re, im, 1))  # compile + warm
    lo, hi = 4, 20
    for _attempt in range(4):
        best = float("inf")
        window = 0.0
        for _ in range(repeats):
            t0 = time.perf_counter()
            _ = float(run(re, im, lo))
            t1 = time.perf_counter()
            _ = float(run(re, im, hi))
            t2 = time.perf_counter()
            window = max(window, (t2 - t1) - (t1 - t0))
            best = min(best, ((t2 - t1) - (t1 - t0)) / (hi - lo))
        if window >= 0.04 or hi >= 2048:  # >=40 ms of signal in the slope
            return best
        lo, hi = lo * 4, hi * 4
    return best


def measure_executor(plan, shape, axis: int) -> str:
    """Pick the fastest executor for `plan.n` at this batch shape, caching
    per (backend, n, rows-bucket, axis) with on-disk wisdom persistence."""
    backend = jax.default_backend()
    rows = 1
    for d in shape[:-1]:
        rows *= int(d)
    # rows==1 beyond VMEM is its own regime (bigfft is single-row only)
    rb = 1 if rows == 1 else _bucket(rows)
    key = (backend, plan.n, rb, axis)
    if not _wisdom_loaded:
        load_wisdom()
    hit = TUNE_CACHE.get(key)
    if hit is not None:
        return hit
    cands = candidates_for(plan.n, rows, backend)
    if len(cands) == 1:
        TUNE_CACHE[key] = cands[0]
        return cands[0]
    from ..core.twiddle import FORWARD

    best_ex, best_t = cands[0], float("inf")
    for ex in cands:
        fn = lambda a, b, _ex=ex: plan._execute_split_axis(
            a, b, FORWARD, None, axis, ex=_ex)
        try:
            t = _slope_time(fn, tuple(shape))
        except Exception:
            continue  # candidate does not compile/run for this shape
        if t < best_t:
            best_ex, best_t = ex, t
    TUNE_CACHE[key] = best_ex
    save_wisdom()
    return best_ex
