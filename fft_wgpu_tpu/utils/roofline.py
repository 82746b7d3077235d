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

__all__ = ["hbm_bandwidth", "fft_flops", "roofline", "ici_bandwidth",
           "pencil_fft3d_model"]

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


def _match_kind(table: dict, kind: str):
    """Longest-prefix match so 'TPU v5p' never falls into the 'TPU v5'
    entry (dict order is not specificity order)."""
    best = None
    for key, bw in table.items():
        if kind.startswith(key) and (best is None or len(key) > best[0]):
            best = (len(key), bw)
    return best[1] if best else None


def hbm_bandwidth(device=None) -> float:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    bw = _match_kind(_HBM_BW, kind)
    if bw is not None:
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


# Aggregate inter-chip interconnect bandwidth per chip (bytes/s, both
# directions summed), from the public TPU spec sheets: v4 2400 Gbps
# (6 links, 3-D torus), v5e 1600 Gbps (4 links, 2-D torus), v5p
# 4800 Gbps, v6e 3584 Gbps.  Used only for scaling MODELS (no multi-chip
# hardware is reachable from this environment); lower bounds assume
# egress-limited transfers with no topology contention.
_ICI_BW = {
    "TPU v4": 3.0e11,
    "TPU v5 lite": 2.0e11,
    "TPU v5e": 2.0e11,
    "TPU v5": 2.0e11,
    "TPU v5p": 6.0e11,
    "TPU v6 lite": 4.48e11,
    "TPU v6e": 4.48e11,
}


def ici_bandwidth(device=None) -> float:
    """Aggregate per-chip ICI bandwidth in bytes/s (model constant)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    bw = _match_kind(_ICI_BW, kind)
    return bw if bw is not None else _ICI_BW["TPU v5e"]


def pencil_fft3d_model(n: int, mesh_shape: tuple[int, int], *, device=None,
                       transposed_output: bool = False,
                       hbm_bw: float | None = None,
                       ici_bw: float | None = None,
                       comm_bytes: float = 8.0) -> dict:
    """Lower-bound cost model for the pencil-decomposed 3-D C2C FFT of an
    n^3 cube over a px x py mesh (parallel/pencil.py:_fft3d_impl).

    Floors, per chip, split-complex f32 (8 B/point):
      - compute: 3 local pencil-FFT passes, each one HBM read + write of
        the full local slice (the fused row kernels are single-pass);
      - ICI: each `all_to_all` along a mesh axis of size m sends
        (m-1)/m of the local slice off-chip; the per-axis egress
        bandwidth is the chip aggregate split across the torus axes and
        halved (egress half of bidirectional).  2 corner turns for
        transposed output, 4 for natural order.  `comm_bytes` is the
        wire size per complex point (8 for split f32, 4 for the
        comm_dtype=bf16 opt-in turns — pencil.py:_a2a).
    With the chunked overlap schedule (`overlap_chunks`) the total floor
    is max(compute, ici) + one chunk of exposed latency ~= max(...).

    Returns times in seconds plus the modeled per-chip byte counts.
    """
    px, py = mesh_shape
    p = px * py
    hbm = hbm_bw or hbm_bandwidth(device)
    ici = ici_bw or ici_bandwidth(device)

    local_bytes = 8.0 * n**3 / p
    compute_s = 3.0 * 2.0 * local_bytes / hbm

    # per-axis egress bound: aggregate / 2 (bidi) / 2 (two torus axes)
    axis_egress = ici / 4.0
    turns = [(py, "Z->Y"), (px, "Y->X")]
    if not transposed_output:
        turns += [(px, "X out"), (py, "Y out")]
    wire_bytes = local_bytes * comm_bytes / 8.0
    ici_bytes = sum(wire_bytes * (m - 1) / m for m, _ in turns)
    ici_s = sum(wire_bytes * (m - 1) / m / axis_egress for m, _ in turns)

    overlapped_s = max(compute_s, ici_s)
    return {
        "chips": p,
        "local_bytes": local_bytes,
        "compute_s": compute_s,
        "ici_s": ici_s,
        "ici_bytes_per_chip": ici_bytes,
        "overlapped_s": overlapped_s,
        "serial_s": compute_s + ici_s,
        # 3 axes x (n^2 rows x 5 n log2 n) = 5 n^3 log2(n^3)
        "gflops": 15.0 * n**3 * math.log2(n) / overlapped_s / 1e9,
    }
