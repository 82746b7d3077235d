"""Spectral models built on the FFT stack (flagship demo workload).

The reference ships no models (it is a transform library — SURVEY §1);
this module is the framework's "model family": Fourier Neural Operator
style spectral convolution layers, exercising the R2C/C2R pipeline, the
plan layer, and AD through the transforms.  Spectral weights are stored as
split re/im real arrays (the framework's native complex representation),
so parameters never cross a host<->device boundary as complex.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.rfft import irfft, rfft

__all__ = ["init_fno1d", "fno1d_apply", "init_fno2d", "fno2d_apply",
           "init_fno3d", "fno3d_apply", "mse_loss", "train_step"]


def _glorot(key, shape, scale):
    return scale * jax.random.normal(key, shape, jnp.float32)


def init_fno1d(key, *, modes=64, width=32, depth=2, in_ch=1, out_ch=1):
    """Parameter pytree for a 1-D FNO: lift -> depth x (spectral + pointwise)
    -> project."""
    keys = jax.random.split(key, 2 + 4 * depth)
    params = {
        "lift": _glorot(keys[0], (in_ch, width), (2.0 / (in_ch + width)) ** 0.5),
        "proj": _glorot(keys[1], (width, out_ch), (2.0 / (width + out_ch)) ** 0.5),
        "blocks": [],
    }
    s = 1.0 / (width * modes) ** 0.5
    for d in range(depth):
        k = keys[2 + 4 * d : 6 + 4 * d]
        params["blocks"].append(
            {
                "wr": _glorot(k[0], (modes, width, width), s),
                "wi": _glorot(k[1], (modes, width, width), s),
                "pw": _glorot(k[2], (width, width), (1.0 / width) ** 0.5),
                "b": jnp.zeros((width,), jnp.float32),
            }
        )
    return params


def _spectral_conv(block, x, modes):
    """x [batch, seq, ch] -> spectral multiply on the first `modes` bins."""
    b, n, c = x.shape
    X = rfft(x, axis=1)  # [b, n//2+1, c] complex64
    Xr = jnp.real(X)[:, :modes, :]
    Xi = jnp.imag(X)[:, :modes, :]
    wr, wi = block["wr"], block["wi"]
    # complex einsum 'bkc,kco->bko' with split arithmetic
    Yr = jnp.einsum("bkc,kco->bko", Xr, wr) - jnp.einsum("bkc,kco->bko", Xi, wi)
    Yi = jnp.einsum("bkc,kco->bko", Xr, wi) + jnp.einsum("bkc,kco->bko", Xi, wr)
    nbins = n // 2 + 1
    pad = [(0, 0), (0, nbins - modes), (0, 0)]
    Y = jax.lax.complex(jnp.pad(Yr, pad), jnp.pad(Yi, pad))
    return irfft(Y, n=n, axis=1)


def fno1d_apply(params, x):
    """Forward pass. x: [batch, seq, in_ch] float32."""
    h = x @ params["lift"]
    modes = params["blocks"][0]["wr"].shape[0]
    for blk in params["blocks"]:
        h = jax.nn.gelu(_spectral_conv(blk, h, modes) + h @ blk["pw"] + blk["b"])
    return h @ params["proj"]


def mse_loss(params, x, y):
    pred = fno1d_apply(params, x)
    return jnp.mean((pred - y) ** 2)


@partial(jax.jit, static_argnames=("lr",))
def train_step(params, x, y, lr=1e-3):
    """One SGD step (jitted end-to-end, AD through rfft/irfft)."""
    loss, grads = jax.value_and_grad(mse_loss)(params, x, y)
    params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return params, loss


# --------------------------------------------------------------------- #
# 2-D spectral operator (FNO2d) — drives the two-pass fft2 kernels
# --------------------------------------------------------------------- #
def init_fno2d(key, *, modes=(16, 16), width=32, depth=2, in_ch=1, out_ch=1):
    """Parameter pytree for a 2-D FNO over [batch, H, W, ch] fields."""
    keys = jax.random.split(key, 2 + 4 * depth)
    params = {
        "lift": _glorot(keys[0], (in_ch, width), (2.0 / (in_ch + width)) ** 0.5),
        "proj": _glorot(keys[1], (width, out_ch), (2.0 / (width + out_ch)) ** 0.5),
        "blocks": [],
    }
    m1, m2 = modes
    s = 1.0 / (width * m1 * m2) ** 0.5
    for d in range(depth):
        k = keys[2 + 4 * d : 6 + 4 * d]
        params["blocks"].append(
            {
                "wr": _glorot(k[0], (m1, m2, width, width), s),
                "wi": _glorot(k[1], (m1, m2, width, width), s),
                "pw": _glorot(k[2], (width, width), (1.0 / width) ** 0.5),
                "b": jnp.zeros((width,), jnp.float32),
            }
        )
    return params


def _spectral_conv2d(block, x, modes):
    """x [batch, H, W, ch]: 2-D spectral multiply on low modes."""
    from ..ops.nd import fft2, ifft2

    b, h, w, c = x.shape
    m1, m2 = modes
    # channels-last complex transform over (H, W)
    X = fft2(jnp.moveaxis(x, -1, 1), axes=(-2, -1))  # [b, c, H, W]
    Xr = jnp.real(X)[:, :, :m1, :m2]
    Xi = jnp.imag(X)[:, :, :m1, :m2]
    wr, wi = block["wr"], block["wi"]
    Yr = jnp.einsum("bcij,ijco->boij", Xr, wr) - jnp.einsum("bcij,ijco->boij", Xi, wi)
    Yi = jnp.einsum("bcij,ijco->boij", Xr, wi) + jnp.einsum("bcij,ijco->boij", Xi, wr)
    pad = [(0, 0), (0, 0), (0, h - m1), (0, w - m2)]
    Y = jax.lax.complex(jnp.pad(Yr, pad), jnp.pad(Yi, pad))
    y = jnp.real(ifft2(Y, axes=(-2, -1)))
    return jnp.moveaxis(y, 1, -1)


def fno2d_apply(params, x):
    """Forward pass. x: [batch, H, W, in_ch] float32."""
    h = x @ params["lift"]
    modes = params["blocks"][0]["wr"].shape[:2]
    for blk in params["blocks"]:
        h = jax.nn.gelu(_spectral_conv2d(blk, h, modes) + h @ blk["pw"] + blk["b"])
    return h @ params["proj"]


# --------------------------------------------------------------------- #
# 3-D spectral operator (FNO3d) — volumetric fields [batch, X, Y, Z, ch];
# under a mesh, GSPMD shards the batched fftn (and parallel/pencil.fft3d
# provides the explicit pencil-decomposed path for solver workloads).
# --------------------------------------------------------------------- #
def init_fno3d(key, *, modes=(8, 8, 8), width=16, depth=2, in_ch=1,
               out_ch=1):
    """Parameter pytree for a 3-D FNO over [batch, X, Y, Z, ch] fields."""
    keys = jax.random.split(key, 2 + 4 * depth)
    params = {
        "lift": _glorot(keys[0], (in_ch, width), (2.0 / (in_ch + width)) ** 0.5),
        "proj": _glorot(keys[1], (width, out_ch), (2.0 / (width + out_ch)) ** 0.5),
        "blocks": [],
    }
    m1, m2, m3 = modes
    s = 1.0 / (width * m1 * m2 * m3) ** 0.5
    for d in range(depth):
        k = keys[2 + 4 * d : 6 + 4 * d]
        params["blocks"].append(
            {
                "wr": _glorot(k[0], (m1, m2, m3, width, width), s),
                "wi": _glorot(k[1], (m1, m2, m3, width, width), s),
                "pw": _glorot(k[2], (width, width), (1.0 / width) ** 0.5),
                "b": jnp.zeros((width,), jnp.float32),
            }
        )
    return params


def _spectral_conv3d(block, x, modes):
    """x [batch, X, Y, Z, ch]: 3-D spectral multiply on low modes."""
    from ..ops.nd import fftn, ifftn

    b, nx, ny, nz, c = x.shape
    m1, m2, m3 = modes
    X = fftn(jnp.moveaxis(x, -1, 1), axes=(-3, -2, -1))  # [b, c, X, Y, Z]
    Xr = jnp.real(X)[:, :, :m1, :m2, :m3]
    Xi = jnp.imag(X)[:, :, :m1, :m2, :m3]
    wr, wi = block["wr"], block["wi"]
    Yr = (jnp.einsum("bcijk,ijkco->boijk", Xr, wr)
          - jnp.einsum("bcijk,ijkco->boijk", Xi, wi))
    Yi = (jnp.einsum("bcijk,ijkco->boijk", Xr, wi)
          + jnp.einsum("bcijk,ijkco->boijk", Xi, wr))
    pad = [(0, 0), (0, 0), (0, nx - m1), (0, ny - m2), (0, nz - m3)]
    Y = jax.lax.complex(jnp.pad(Yr, pad), jnp.pad(Yi, pad))
    y = jnp.real(ifftn(Y, axes=(-3, -2, -1)))
    return jnp.moveaxis(y, 1, -1)


def fno3d_apply(params, x):
    """Forward pass. x: [batch, X, Y, Z, in_ch] float32."""
    h = x @ params["lift"]
    modes = params["blocks"][0]["wr"].shape[:3]
    for blk in params["blocks"]:
        h = jax.nn.gelu(_spectral_conv3d(blk, h, modes) + h @ blk["pw"] + blk["b"])
    return h @ params["proj"]
