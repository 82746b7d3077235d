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

__all__ = ["make_mesh", "make_pencil_mesh"]


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
