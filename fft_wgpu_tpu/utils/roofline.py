"""Roofline accounting for FFT benchmarks.

The reference times wall-clock including H2D/D2H per iteration
(examples/basic.rs:70-129); here device-time-only measurement is compared
against the HBM-bandwidth roofline (the binding resource for a fused
batched FFT): a C2C FFT must read and write every complex element once,
so t_min = 2 * batch * n * 8 bytes / BW, and the conventional rate is
5 N log2 N flops (BASELINE.json metric).
"""

from __future__ import annotations

import math

import jax

__all__ = ["hbm_bandwidth", "fft_flops", "roofline"]

# Peak HBM bandwidth by device kind (bytes/s).
_HBM_BW = {
    "TPU v4": 1.2288e12,
    "TPU v5 lite": 0.819e12,
    "TPU v5e": 0.819e12,
    "TPU v5": 0.819e12,  # v5 lite reports as "TPU v5" on some runtimes
    "TPU v5p": 2.765e12,
    "TPU v6 lite": 1.64e12,
    "TPU v6e": 1.64e12,
    "cpu": 0.1e12,
}


def hbm_bandwidth(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for key, bw in _HBM_BW.items():
        if kind.startswith(key):
            return bw
    return _HBM_BW.get("TPU v5e") if "TPU" in kind else _HBM_BW["cpu"]


def fft_flops(n: int, batch: int = 1) -> float:
    """Conventional FFT flop count 5 N log2 N per transform."""
    return 5.0 * n * math.log2(n) * batch


def roofline(n: int, batch: int, seconds: float, *, passes: int = 1, device=None):
    """Return dict with achieved GFLOP/s, roofline GFLOP/s, and fraction.

    `passes` = HBM round trips the algorithm fundamentally needs (1 for the
    fused kernel, ~3 for four-step)."""
    bw = hbm_bandwidth(device)
    flops = fft_flops(n, batch)
    bytes_min = 2.0 * batch * n * 8.0 * passes  # read + write, complex64
    t_min = bytes_min / bw
    achieved = flops / seconds
    roof = flops / t_min
    return {
        "gflops": achieved / 1e9,
        "roofline_gflops": roof / 1e9,
        "fraction": achieved / roof,
        "t_min_s": t_min,
        "bandwidth": bw,
    }
