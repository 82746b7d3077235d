"""Device mesh construction helpers.

The reference is single-device (one adapter/queue ever created —
fft_wgpu src/lib.rs:38-59); multi-chip execution is a new first-class
subsystem here (SURVEY §2 parallelism checklist).  Meshes are the TPU
`prepare_gpu()` analogue: build once, pass to the distributed transforms.
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh", "make_pencil_mesh", "make_hybrid_mesh"]


def make_mesh(shape=None, axis_names=("x",), devices=None) -> Mesh:
    """Build a Mesh over `devices` (default: all).

    `shape=None` uses all devices on one axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),)
    if math.prod(shape) != len(devices):
        raise ValueError(f"mesh shape {shape} != {len(devices)} devices")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def make_pencil_mesh(devices=None, axis_names=("px", "py")) -> Mesh:
    """2-D mesh as square as possible — the pencil-decomposition layout
    (BASELINE.json config 5: all-to-all over ICI rides both mesh axes)."""
    devices = list(devices if devices is not None else jax.devices())
    nd = len(devices)
    p1 = 1
    for d in range(int(math.isqrt(nd)), 0, -1):
        if nd % d == 0:
            p1 = d
            break
    return make_mesh((p1, nd // p1), axis_names, devices)


def make_hybrid_mesh(axis_names=("dcn", "ici"), devices=None) -> Mesh:
    """Multi-slice (ICI x DCN) 2-D mesh: the MINOR axis stays within one
    TPU slice (collectives along it ride ICI), the MAJOR axis crosses
    slice boundaries (DCN).

    Slice membership comes from each device's `slice_index` attribute
    (present on real multi-slice TPU deployments); devices without it —
    single-slice TPUs, the virtual CPU mesh — fall back to ONE slice,
    i.e. a [1, n] mesh whose minor axis is all-ICI.  For the pencil
    transforms, lay shardings out so the X<->Y corner turn (the
    per-step all-to-all) maps to the 'ici' axis and only batch/outer
    parallelism to 'dcn' — DCN all-to-all bandwidth is an order of
    magnitude below ICI (utils/roofline.pencil_fft3d_model).
    """
    devices = list(devices if devices is not None else jax.devices())
    slices: dict = {}
    for d in devices:
        slices.setdefault(getattr(d, "slice_index", 0), []).append(d)
    counts = {len(v) for v in slices.values()}
    if len(counts) != 1:
        raise ValueError(
            f"uneven slices: {sorted((k, len(v)) for k, v in slices.items())}")
    per = counts.pop()
    ordered = [d for k in sorted(slices) for d in slices[k]]
    return make_mesh((len(slices), per), axis_names, ordered)
