"""Gradients through the fused Bluestein/CZT chirp kernels (ADVICE r4).

fft_chirp_forward_split / fft_chirp_inverse_split carry HAND-WRITTEN
linear_call transposes (pallas_fft.py) that no test reached: the CPU
suite never routes to them (backend-gated) and the hardware tier tests
forward numerics only — a wrong adjoint would ship silently.  These
tests run the real TPU routing with the kernels interpreted (the
fake-tpu mechanism of tests/test_padded_adoption.py) and compare
jax.grad through the fused path against jax.grad through a composed
jnp.fft implementation of the SAME linear map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_wgpu_tpu.ops import pallas_fft as pf


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pf, "_FORCE_INTERPRET", True)
    from fft_wgpu_tpu.utils.jit_cache import _CACHE

    _CACHE.clear()  # cached executables skip re-tracing (spies/backend)
    yield
    # traces made under the faked backend must not leak into other tests
    jax.clear_caches()
    _CACHE.clear()
    from fft_wgpu_tpu.plan.plan import get_plan

    get_plan.cache_clear()


def _grads(fn, re, im, Wr, Wi):
    """grad of sum(Wr*Yr + Wi*Yi) wrt (re, im) — a full random-cotangent
    exercise of the transpose rule."""

    def loss(a, b):
        Yr, Yi = fn(a, b)
        return jnp.sum(Yr * Wr + Yi * Wi)

    return jax.grad(loss, argnums=(0, 1))(re, im)


def _close(got, want, tol, what):
    for g, w, part in zip(got, want, ("re", "im")):
        err = float(np.linalg.norm(np.asarray(g) - np.asarray(w))
                    / max(np.linalg.norm(np.asarray(w)), 1e-30))
        assert err < tol, f"{what} d{part}: rel {err:.3e} >= {tol}"


def test_chirp_forward_grad(fake_tpu, rng):
    """y = FFT_m(zero_pad(h .* x)) — adjoint vs composed jnp.fft."""
    rows, n_p, m = 8, 256, 512
    re = jnp.asarray(rng.standard_normal((rows, n_p)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((rows, n_p)), jnp.float32)
    hr = jnp.asarray(rng.standard_normal(n_p), jnp.float32)
    hi = jnp.asarray(rng.standard_normal(n_p), jnp.float32)
    Wr = jnp.asarray(rng.standard_normal((rows, m)), jnp.float32)
    Wi = jnp.asarray(rng.standard_normal((rows, m)), jnp.float32)

    fused = lambda a, b: pf.fft_chirp_forward_split(a, b, hr, hi, m, -1)

    def composed(a, b):
        x = jax.lax.complex(a * hr - b * hi, a * hi + b * hr)
        X = jnp.fft.fft(x, n=m, axis=-1)  # fft(n=m) zero-pads
        return jnp.real(X), jnp.imag(X)

    _close(_grads(fused, re, im, Wr, Wi),
           _grads(composed, re, im, Wr, Wi), 1e-4, "chirp fwd")
    # forward numerics too (same tolerance class)
    _close(jax.jit(fused)(re, im), composed(re, im), 1e-4, "chirp fwd val")


@pytest.mark.parametrize("n_out", [512, 256])
def test_chirp_inverse_grad(fake_tpu, rng, n_out):
    """y = g .* (scale * FFT_sign(h .* x))[..., :n_out] — the Bluestein
    (n_out == m) and CZT narrow-store (n_out < m) configurations."""
    rows, m = 8, 512
    sc = 1.0 / m
    re = jnp.asarray(rng.standard_normal((rows, m)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((rows, m)), jnp.float32)
    hr = jnp.asarray(rng.standard_normal(m), jnp.float32)
    hi = jnp.asarray(rng.standard_normal(m), jnp.float32)
    gr = jnp.asarray(rng.standard_normal(n_out), jnp.float32)
    gi = jnp.asarray(rng.standard_normal(n_out), jnp.float32)
    Wr = jnp.asarray(rng.standard_normal((rows, n_out)), jnp.float32)
    Wi = jnp.asarray(rng.standard_normal((rows, n_out)), jnp.float32)

    fused = lambda a, b: pf.fft_chirp_inverse_split(
        a, b, hr, hi, gr, gi, n_out, +1, sc)

    def composed(a, b):
        x = jax.lax.complex(a * hr - b * hi, a * hi + b * hr)
        X = jnp.fft.ifft(x, axis=-1)[..., :n_out]  # ifft == sc*FFT_{+1}
        return (jnp.real(X) * gr - jnp.imag(X) * gi,
                jnp.real(X) * gi + jnp.imag(X) * gr)

    _close(_grads(fused, re, im, Wr, Wi),
           _grads(composed, re, im, Wr, Wi), 1e-4, f"chirp inv {n_out}")
    _close(jax.jit(fused)(re, im), composed(re, im), 1e-4,
           f"chirp inv val {n_out}")


def test_prod_c2r_grad(fake_tpu, rng):
    """The fused product-C2R (fftconvolve epilogue) carries a
    custom_vjp whose backward differentiates the composed form — grads
    through the fused path must equal grads through the composed path
    (both operands)."""
    from fft_wgpu_tpu.ops.rfft import (irfft_last_split,
                                       irfft_prod_last_split)

    n = 512
    bins = 384  # pad_bins(512)
    rows = 4
    Ar = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    Ai = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    Br = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    Bi = jnp.asarray(rng.standard_normal((rows, bins)), jnp.float32)
    # pad columns past Nyquist must be zero (serving-form contract)
    z = jnp.zeros((rows, bins - (n // 2 + 1)), jnp.float32)
    Ar = jnp.concatenate([Ar[:, : n // 2 + 1], z], axis=1)
    Ai = jnp.concatenate([Ai[:, : n // 2 + 1], z], axis=1)
    Br = jnp.concatenate([Br[:, : n // 2 + 1], z], axis=1)
    Bi = jnp.concatenate([Bi[:, : n // 2 + 1], z], axis=1)
    W = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)

    def loss_fused(a, b, c, d):
        return jnp.sum(W * irfft_prod_last_split(a, b, c, d, n, 1.0 / n,
                                                 padded_in=True))

    def loss_composed(a, b, c, d):
        pr = a * c - b * d
        pi = a * d + b * c
        return jnp.sum(W * irfft_last_split(pr, pi, n, 1.0 / n,
                                            padded_in=True))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(Ar, Ai, Br, Bi)
    gc = jax.grad(loss_composed, argnums=(0, 1, 2, 3))(Ar, Ai, Br, Bi)
    for g1, g2, tag in zip(gf, gc, "abcd"):
        err = float(np.linalg.norm(np.asarray(g1) - np.asarray(g2))
                    / max(np.linalg.norm(np.asarray(g2)), 1e-30))
        assert err < 1e-4, f"prod-C2R grad d{tag}: {err:.3e}"
    # values too
    err = abs(float(loss_fused(Ar, Ai, Br, Bi))
              - float(loss_composed(Ar, Ai, Br, Bi)))
    assert err < 1e-2


def test_bluestein_end_to_end_grad(fake_tpu, rng):
    """jax.grad through the PUBLIC prime-length fft (both fused chirp
    kernels composed) vs jnp.fft on the same loss."""
    from fft_wgpu_tpu.ops.bluestein import fft_bluestein_split

    rows, n = 4, 521  # prime: always the Bluestein path
    re = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    Wr = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)
    Wi = jnp.asarray(rng.standard_normal((rows, n)), jnp.float32)

    fused = lambda a, b: fft_bluestein_split(a, b, -1)

    def composed(a, b):
        X = jnp.fft.fft(jax.lax.complex(a, b), axis=-1)
        return jnp.real(X), jnp.imag(X)

    _close(_grads(fused, re, im, Wr, Wi),
           _grads(composed, re, im, Wr, Wi), 1e-4, "bluestein e2e")
