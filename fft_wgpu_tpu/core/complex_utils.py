"""Split real/imag complex representation helpers.

TPU-first design note: Pallas TPU kernels have no native complex dtype, and
XLA on TPU lowers complex arithmetic to real ops anyway.  We therefore carry
complex data as a pair of real arrays ``(re, im)`` through the whole compute
path and expose a ``complex64`` facade only at the public API boundary.

This mirrors the reference's interleaved ``Complex { real, imag }`` data model
(fft_wgpu src/lib.rs:10-27) but in planar (split) form, which is the layout
the 8x128 VPU and the MXU actually want.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["split", "merge", "promote_to_split"]


def split(x):
    """complex array -> (re, im) pair of real float32 arrays."""
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    x = x.astype(jnp.float32)
    return x, jnp.zeros_like(x)


def merge(re, im):
    """(re, im) pair -> complex64 array (explicit, x64-config-proof)."""
    return jax.lax.complex(jnp.asarray(re, jnp.float32), jnp.asarray(im, jnp.float32))


def promote_to_split(x):
    """Accept complex/real jnp or numpy input, return (re, im) float32 pair."""
    if isinstance(x, (tuple, list)) and len(x) == 2:
        re, im = x
        return jnp.asarray(re, jnp.float32), jnp.asarray(im, jnp.float32)
    if isinstance(x, np.ndarray):
        x = jnp.asarray(x)
    return split(x)
