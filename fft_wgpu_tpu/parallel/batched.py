"""Data-parallel batched transforms via sharding annotations.

The pencil module (shard_map) handles transforms whose AXES span chips;
for the much more common case — a large batch of independent transforms —
plain GSPMD sharding is the right tool: annotate the batch dimension and
let XLA partition the plan executable across the mesh (zero communication,
each chip runs the fused kernels on its shard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.complex_utils import merge, promote_to_split
from ..core.twiddle import FORWARD, INVERSE
from .mesh import make_mesh

__all__ = ["fft_batch_sharded", "ifft_batch_sharded"]


def _run(x, mesh, sign, scale):
    from ..plan.plan import get_plan

    re, im = promote_to_split(x)
    axis = mesh.axis_names[0]
    sh = NamedSharding(mesh, P(axis, *([None] * (re.ndim - 1))))
    re = jax.device_put(re, sh)
    im = jax.device_put(im, sh)
    p = get_plan(re.shape[-1], "auto")

    @jax.jit
    def impl(r, i):
        r, i = p._execute_split(r, i, sign, scale)
        return merge(r, i)

    return impl(re, im)


def fft_batch_sharded(x, mesh: Mesh | None = None):
    """Forward FFT of [batch, ..., n] with the batch sharded over the mesh.

    Embarrassingly parallel: no collectives; each chip transforms its rows
    with the local fused kernels.
    """
    mesh = mesh or make_mesh()
    return _run(x, mesh, FORWARD, None)


def ifft_batch_sharded(x, mesh: Mesh | None = None):
    """Inverse (1/N) counterpart of :func:`fft_batch_sharded`."""
    mesh = mesh or make_mesh()
    n = jnp.shape(x)[-1]
    return _run(x, mesh, INVERSE, 1.0 / n)
