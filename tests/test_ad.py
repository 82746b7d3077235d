"""Autodiff through the Pallas kernels (custom VJPs).

pallas_call has no AD rule; each kernel carries a custom_vjp exploiting
linearity (adjoint = sign-flipped transform; R2C/C2R are an adjoint
pair).  Oracles: jax.grad of the same loss through jnp.fft.  Kernels run
in interpret mode on this CPU tier; the same VJPs wrap the real TPU
kernels (the only backend-dependent part is the primal).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fft_wgpu_tpu.ops import bigfft
from fft_wgpu_tpu.ops import pallas_fft as pf


def _relg(a, b):
    return float(jnp.linalg.norm(a - b) / jnp.linalg.norm(b))


@pytest.fixture
def data(rng):
    n = 1024
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return n, mk


def test_grad_fft_batched(data):
    n, mk = data
    re, im, wr, wi = mk(4, n), mk(4, n), mk(4, n), mk(4, n)

    def loss(fft):
        def f(a, b):
            Xr, Xi = fft(a, b)
            return jnp.sum(Xr * wr + Xi * wi)
        return jax.grad(f, argnums=(0, 1))(re, im)

    g1 = loss(lambda a, b: pf.fft_batched_split(a, b, -1, interpret=True))
    g2 = loss(lambda a, b: (
        jnp.real(jnp.fft.fft(jax.lax.complex(a, b), axis=-1)),
        jnp.imag(jnp.fft.fft(jax.lax.complex(a, b), axis=-1))))
    assert _relg(g1[0], g2[0]) < 1e-5 and _relg(g1[1], g2[1]) < 1e-5
    # inverse with folded scale
    g3 = loss(lambda a, b: pf.fft_batched_split(a, b, +1, 1.0 / n,
                                                interpret=True))
    g4 = loss(lambda a, b: (
        jnp.real(jnp.fft.ifft(jax.lax.complex(a, b), axis=-1)),
        jnp.imag(jnp.fft.ifft(jax.lax.complex(a, b), axis=-1))))
    assert _relg(g3[0], g4[0]) < 1e-5 and _relg(g3[1], g4[1]) < 1e-5


def test_grad_axis0_and_rows_t(data):
    n, mk = data
    re, im = mk(2, 256, 256), mk(2, 256, 256)
    wr, wi = mk(2, 256, 256), mk(2, 256, 256)

    def f(a, b):
        Xr, Xi = pf.fft_axis0_split(a, b, -1, interpret=True)
        return jnp.sum(Xr * wr + Xi * wi)

    def fr(a, b):
        X = jnp.fft.fft(jax.lax.complex(a, b), axis=-2)
        return jnp.sum(jnp.real(X) * wr + jnp.imag(X) * wi)

    g1 = jax.grad(f, argnums=(0, 1))(re, im)
    g2 = jax.grad(fr, argnums=(0, 1))(re, im)
    assert _relg(g1[0], g2[0]) < 1e-5 and _relg(g1[1], g2[1]) < 1e-5

    # rows_t with outer twiddle (the four-step pass 2)
    wtr, wti = mk(256, 2), mk(256, 2)

    def g(a, b):
        Xr, Xi = pf.fft_rows_transposed_split(
            a, b, -1, outer=(2, 2 * 256), interpret=True)
        return jnp.sum(Xr * wtr + Xi * wti)

    def gref(a, b):
        r = jnp.arange(2, dtype=jnp.float32)[:, None]
        m = jnp.arange(256, dtype=jnp.float32)[None, :]
        tw = jnp.exp(-2j * jnp.pi * r * m / (2 * 256))
        X = jnp.fft.fft(jax.lax.complex(a, b) * tw, axis=-1)
        Xt = jnp.swapaxes(X, -1, -2)
        return jnp.sum(jnp.real(Xt) * wtr + jnp.imag(Xt) * wti)

    a2, b2 = mk(2, 256), mk(2, 256)
    h1 = jax.grad(g, argnums=(0, 1))(a2, b2)
    h2 = jax.grad(gref, argnums=(0, 1))(a2, b2)
    assert _relg(h1[0], h2[0]) < 1e-5 and _relg(h1[1], h2[1]) < 1e-5


def test_grad_rfft_irfft(data):
    n, mk = data
    x = mk(4, n)
    wr, wi = mk(4, n // 2 + 1), mk(4, n // 2 + 1)

    def f(a):
        Xr, Xi = pf.rfft_rows_split(a, None, interpret=True)
        return jnp.sum(Xr * wr + Xi * wi)

    def fr(a):
        X = jnp.fft.rfft(a, axis=-1)
        return jnp.sum(jnp.real(X) * wr + jnp.imag(X) * wi)

    assert _relg(jax.grad(f)(x), jax.grad(fr)(x)) < 1e-5

    Xr, Xi, wv = mk(4, n // 2 + 1), mk(4, n // 2 + 1), mk(4, n)

    def g(a, b):
        return jnp.sum(pf.irfft_rows_split(a, b, n, 1.0 / n,
                                           interpret=True) * wv)

    def gr(a, b):
        return jnp.sum(jnp.fft.irfft(jax.lax.complex(a, b), n=n,
                                     axis=-1) * wv)

    g1 = jax.grad(g, argnums=(0, 1))(Xr, Xi)
    g2 = jax.grad(gr, argnums=(0, 1))(Xr, Xi)
    assert _relg(g1[0], g2[0]) < 1e-5 and _relg(g1[1], g2[1]) < 1e-5


def test_grad_bigfft(rng):
    n = 1 << 15
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    re, im, wr, wi = mk(1, n), mk(1, n), mk(1, n), mk(1, n)

    def f(a, b):
        Xr, Xi = bigfft.fft_big_split(a, b, -1, interpret=True)
        return jnp.sum(Xr * wr + Xi * wi)

    def fr(a, b):
        X = jnp.fft.fft(jax.lax.complex(a, b), axis=-1)
        return jnp.sum(jnp.real(X) * wr + jnp.imag(X) * wi)

    g1 = jax.grad(f, argnums=(0, 1))(re, im)
    g2 = jax.grad(fr, argnums=(0, 1))(re, im)
    assert _relg(g1[0], g2[0]) < 1e-5 and _relg(g1[1], g2[1]) < 1e-5


def test_jvp_forward_mode(data):
    """linear_call gives forward-mode too: jvp(tangent) == fft(tangent)."""
    n, mk = data
    re, im, tr, ti = mk(2, n), mk(2, n), mk(2, n), mk(2, n)
    _, (dr, di) = jax.jvp(
        lambda a, b: pf.fft_batched_split(a, b, -1, interpret=True),
        (re, im), (tr, ti))
    ref = jnp.fft.fft(jax.lax.complex(tr, ti), axis=-1)
    assert _relg(dr, jnp.real(ref)) < 1e-5
    assert _relg(di, jnp.imag(ref)) < 1e-5

    x, tx = mk(2, n), mk(2, n)
    _, (dR, dI) = jax.jvp(
        lambda a: pf.rfft_rows_split(a, None, interpret=True), (x,), (tx,))
    refr = jnp.fft.rfft(tx, axis=-1)
    assert _relg(dR, jnp.real(refr)) < 1e-5
    assert _relg(dI, jnp.imag(refr)) < 1e-5


class TestNewOpsAD:
    def test_frft_adjoint_consistency(self, rng):
        # frft is linear: <F x, y> == <x, F^H y> with F^H = F^{-a}
        import jax
        import jax.numpy as jnp
        import fft_wgpu_tpu as ftt

        n, a = 96, 0.8
        xr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        xi = jnp.asarray(rng.standard_normal(n).astype(np.float32))

        def loss(re, im):
            F = ftt.frft(jax.lax.complex(re, im), a)
            return jnp.sum(jnp.real(F) ** 2 + jnp.imag(F) ** 2)

        g = jax.grad(loss, argnums=(0, 1))(xr, xi)
        # numerical directional derivative
        dr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        di = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        eps = 1e-3
        f1 = loss(xr + eps * dr, xi + eps * di)
        f0 = loss(xr - eps * dr, xi - eps * di)
        num = (f1 - f0) / (2 * eps)
        ana = jnp.sum(g[0] * dr + g[1] * di)
        assert abs(float(num - ana)) / abs(float(ana)) < 2e-3

    def test_dht_grad(self, rng):
        import jax
        import jax.numpy as jnp
        import fft_wgpu_tpu as ftt

        x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
        g = jax.grad(lambda v: jnp.sum(ftt.dht(v) ** 2))(x)
        # DHT is symmetric: grad = 2 * DHT(DHT(x)) = 2 n x
        np.testing.assert_allclose(np.asarray(g), 2 * 64 * np.asarray(x),
                                   rtol=1e-4)

    def test_short_time_fft_grad_flows(self, rng):
        import jax
        import jax.numpy as jnp
        import scipy.signal as ss
        import fft_wgpu_tpu as ftt

        st = ftt.ShortTimeFFT(ss.windows.hann(16, sym=False), 4, 1.0)
        x = jnp.asarray(rng.standard_normal(80).astype(np.float32))

        def loss(v):
            S = st.stft(v)
            return jnp.sum(jnp.abs(S) ** 2)

        g = jax.grad(loss)(x)
        assert np.all(np.isfinite(np.asarray(g)))
        d = jnp.asarray(rng.standard_normal(80).astype(np.float32))
        eps = 1e-2
        num = (loss(x + eps * d) - loss(x - eps * d)) / (2 * eps)
        ana = jnp.sum(g * d)
        assert abs(float(num - ana)) / max(abs(float(ana)), 1e-6) < 5e-3
