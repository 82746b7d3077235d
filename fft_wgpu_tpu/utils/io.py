"""Host<->device transfer helpers.

Some TPU runtimes (e.g. the experimental axon tunnel) support complex64
*compute* inside jitted programs but not complex device->host transfers.
These helpers move complex data across the boundary as planar re/im float32
(the framework's native representation anyway) — the analogue of the
reference's staging-buffer readback (fft_wgpu examples/basic.rs:84-122),
done once per result instead of per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["device_get_complex", "device_put_complex", "enable_persistent_compilation_cache"]


@jax.jit
def _split_for_host(z):
    return jnp.real(z).astype(jnp.float32), jnp.imag(z).astype(jnp.float32)


def device_get_complex(z) -> np.ndarray:
    """Fetch a (possibly complex) device array to host numpy, transferring
    planar float32 so backends without complex-transfer support work."""
    z = jnp.asarray(z)
    if not jnp.iscomplexobj(z):
        return np.asarray(z)
    re, im = _split_for_host(z)
    from .native import host_merge_complex

    out = host_merge_complex(np.asarray(re), np.asarray(im))
    if out is not None:  # one-pass threaded C++ interleave
        return out
    return np.asarray(re) + 1j * np.asarray(im)


def device_put_complex(x: np.ndarray, device=None):
    """Host complex numpy -> device complex64 array, staged as planar f32."""
    x = np.asarray(x)
    if not np.iscomplexobj(x):
        return jax.device_put(x, device)
    from .native import host_split_complex

    pair = host_split_complex(x)
    if pair is None:
        pair = (np.ascontiguousarray(x.real, np.float32),
                np.ascontiguousarray(x.imag, np.float32))
    re = jax.device_put(pair[0], device)
    im = jax.device_put(pair[1], device)
    return jax.jit(jax.lax.complex)(re, im)


def enable_persistent_compilation_cache(path: str = "~/.cache/fft_wgpu_tpu_xla"):
    """Enable JAX's on-disk compilation cache for plan executables.

    Remote-compile TPU runtimes can take minutes per kernel; with the
    persistent cache, plan warmup after the first process start is
    near-instant — the serving-deployment analogue of shipping precompiled
    pipelines.
    """
    import os

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return p
