"""Tracing / profiling hooks (SURVEY §5: absent in the reference, which
only has wall-clock `Instant` + `dbg!` — fft_wgpu examples/basic.rs:70,129).

Provides:
* `trace(dir)` — context manager around `jax.profiler` so any transform
  call can be captured for xprof/tensorboard.
* `op_stats(n, batch, seconds)` — per-op GFLOP/s (5 N log2 N convention)
  and HBM roofline fraction, the structured counterpart of the reference's
  printed elapsed times.
* `annotate(name)` — named trace region for plan executors.
"""

from __future__ import annotations

import contextlib
import math

import jax

from .roofline import fft_flops, hbm_bandwidth

__all__ = ["trace", "annotate", "op_stats"]


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile of the enclosed block (view with xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named profiler region (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)


def op_stats(n: int, batch: int, seconds: float, *, passes: int = 1,
             device=None) -> dict:
    """GFLOP/s + roofline accounting for one batched-1D FFT execution."""
    bw = hbm_bandwidth(device)
    flops = fft_flops(n, batch)
    bytes_moved = 2.0 * batch * n * 8.0 * passes
    return {
        "n": n,
        "batch": batch,
        "seconds": seconds,
        "gflops": flops / seconds / 1e9,
        "gbps": bytes_moved / seconds / 1e9,
        "roofline_fraction": (bytes_moved / bw) / seconds,
        "flops_per_element": 5.0 * math.log2(n),
    }
