"""NUFFT types 1/2 vs the direct NUDFT oracle (f64 host sums)."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def _modes(n):
    return np.arange(-(n // 2), n - n // 2)


def _direct1(x, c, n, isign):
    k = _modes(n)[:, None]
    return (np.exp(1j * isign * k * x[None, :]) @ c.astype(np.complex128))


def _direct2(x, f, isign):
    n = f.shape[-1]
    k = _modes(n)[None, :]
    return np.exp(1j * isign * x[:, None] * k) @ f.astype(np.complex128)


@pytest.mark.parametrize("n", [16, 33, 128])
@pytest.mark.parametrize("isign", [+1, -1])
def test_nufft1d1(n, isign, rng):
    M = 200
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    got = np.asarray(ftt.nufft1d1(x, c, n, isign=isign))
    want = _direct1(x.astype(np.float64), c, n, isign)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


@pytest.mark.parametrize("n", [16, 33, 128])
@pytest.mark.parametrize("isign", [+1, -1])
def test_nufft1d2(n, isign, rng):
    M = 200
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    f = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(ftt.nufft1d2(x, f, isign=isign))
    want = _direct2(x.astype(np.float64), f, isign)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


def test_nufft1d_batched(rng):
    M, n, B = 100, 32, 3
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal((B, M)) + 1j * rng.standard_normal((B, M))).astype(np.complex64)
    got = np.asarray(ftt.nufft1d1(x, c, n))
    assert got.shape == (B, n)
    for b in range(B):
        want = _direct1(x.astype(np.float64), c[b], n, +1)
        rel = np.linalg.norm(got[b] - want) / np.linalg.norm(want)
        assert rel < 5e-5, (b, rel)


def test_nufft1_uniform_points_match_fft(rng):
    """On equispaced points the type-2 NUFFT must reproduce the uniform
    DFT (up to spreading error)."""
    n = 64
    x = (np.arange(n) * (2 * np.pi / n)).astype(np.float32)
    f = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    got = np.asarray(ftt.nufft1d2(x, f, isign=-1))
    want = _direct2(x.astype(np.float64), f, -1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


def test_nufft1_2_adjoint(rng):
    """<nufft1d2(f), c> == <f, nufft1d1(c)> (adjoint pair with opposite
    default signs)."""
    M, n = 150, 48
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    f = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    lhs = np.vdot(np.asarray(ftt.nufft1d2(x, f, isign=-1)), c)
    rhs = np.vdot(f, np.asarray(ftt.nufft1d1(x, c, n, isign=+1)))
    assert abs(lhs - rhs) / abs(rhs) < 5e-5


@pytest.mark.parametrize("ns", [(16, 16), (16, 24), (33, 16)])
def test_nufft2d1(ns, rng):
    M = 150
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    y = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    got = np.asarray(ftt.nufft2d1(x, y, c, ns))
    k1 = _modes(ns[0])[:, None, None]
    k2 = _modes(ns[1])[None, :, None]
    want = np.sum(
        c[None, None, :].astype(np.complex128)
        * np.exp(1j * (k1 * x[None, None, :] + k2 * y[None, None, :])), -1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


@pytest.mark.parametrize("ns", [(16, 16), (24, 16)])
def test_nufft2d2(ns, rng):
    M = 150
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    y = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    f = (rng.standard_normal(ns) + 1j * rng.standard_normal(ns)).astype(np.complex64)
    got = np.asarray(ftt.nufft2d2(x, y, f))
    k1 = _modes(ns[0])[:, None]
    k2 = _modes(ns[1])[None, :]
    want = np.array([
        np.sum(f.astype(np.complex128)
               * np.exp(-1j * (k1 * float(xj) + k2 * float(yj))))
        for xj, yj in zip(x, y)
    ])
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel


@pytest.mark.parametrize("isign", [+1, -1])
def test_nufft1d3(isign, rng):
    M, K = 180, 90
    x = rng.uniform(-3.0, 7.0, M).astype(np.float32)
    s = rng.uniform(-40.0, 25.0, K).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    got = np.asarray(ftt.nufft1d3(x, c, s, isign=isign))
    want = np.exp(1j * isign * s[:, None].astype(np.float64)
                  * x[None, :].astype(np.float64)) @ c.astype(np.complex128)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel


def test_nufft1d3_matches_type2_on_integer_freqs(rng):
    """When s_k are the integer modes, type 3 must agree with type 2."""
    M, n = 120, 32
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    f = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    # type 2: c_j = sum_k f_k e^{-i k x_j}; as type 3 with roles swapped:
    # points = modes k, freqs = x_j
    k = _modes(n).astype(np.float32)
    got = np.asarray(ftt.nufft1d3(k, f, x, isign=-1))
    want = np.asarray(ftt.nufft1d2(x, f, isign=-1))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 2e-4, rel


def test_nufft3d_roundtrip_oracle(rng):
    M, ns = 80, (8, 12, 10)
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    y = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    z = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    got = np.asarray(ftt.nufft3d1(x, y, z, c, ns))
    k1 = _modes(ns[0])[:, None, None, None]
    k2 = _modes(ns[1])[None, :, None, None]
    k3 = _modes(ns[2])[None, None, :, None]
    want = np.sum(c[None, None, None, :].astype(np.complex128)
                  * np.exp(1j * (k1 * x + k2 * y + k3 * z)), -1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 5e-5, rel

    f = (rng.standard_normal(ns) + 1j * rng.standard_normal(ns)).astype(np.complex64)
    got2 = np.asarray(ftt.nufft3d2(x, y, z, f))
    want2 = np.array([
        np.sum(f.astype(np.complex128)
               * np.exp(-1j * (k1[..., 0] * float(xj) + k2[..., 0] * float(yj)
                               + k3[..., 0] * float(zj))))
        for xj, yj, zj in zip(x, y, z)])
    rel2 = np.linalg.norm(got2 - want2) / np.linalg.norm(want2)
    assert rel2 < 5e-5, rel2


def test_nufft_autodiff(rng):
    """jax.grad flows through the spread/FFT/gather pipeline (the MRI
    reconstruction pattern: least-squares data fit through type 2)."""
    import jax
    import jax.numpy as jnp

    M, n = 60, 32
    x = rng.uniform(0, 2 * np.pi, M).astype(np.float32)
    data = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(np.complex64)
    dr = jnp.asarray(data.real)
    di = jnp.asarray(data.imag)

    def loss(fr, fi):
        v = ftt.nufft1d2(x, (fr, fi), isign=-1)
        return jnp.sum(jnp.abs(jnp.real(v) - dr) ** 2
                       + jnp.abs(jnp.imag(v) - di) ** 2)

    fr0 = jnp.zeros(n, jnp.float32)
    fi0 = jnp.zeros(n, jnp.float32)
    gr, gi = jax.grad(loss, argnums=(0, 1))(fr0, fi0)
    # analytic gradient: -2 * adjoint(residual) = -2 * nufft1d1(conj ...)
    adj = np.asarray(ftt.nufft1d1(x, data, n, isign=+1))
    assert np.allclose(np.asarray(gr), -2 * adj.real, atol=2e-3), \
        np.abs(np.asarray(gr) + 2 * adj.real).max()
    assert np.allclose(np.asarray(gi), -2 * adj.imag, atol=2e-3)


class TestType3ND:
    def test_2d3_vs_direct(self, rng):
        M, K = 120, 80
        x = rng.uniform(-3.0, 2.0, M).astype(np.float32)
        y = rng.uniform(0.5, 6.0, M).astype(np.float32)
        c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(
            np.complex64)
        s = rng.uniform(-12.0, 9.0, K).astype(np.float32)
        t = rng.uniform(-5.0, 15.0, K).astype(np.float32)
        want = np.exp(1j * (s[:, None].astype(np.float64) * x[None, :]
                            + t[:, None].astype(np.float64) * y[None, :])
                      ) @ c.astype(np.complex128)
        got = np.asarray(ftt.device_get_complex(ftt.nufft2d3(x, y, c, s, t)))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-5, rel

    def test_2d3_isign_minus(self, rng):
        M, K = 60, 50
        x = rng.uniform(-1.0, 1.0, M).astype(np.float32)
        y = rng.uniform(-2.0, 2.0, M).astype(np.float32)
        c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(
            np.complex64)
        s = rng.uniform(-8.0, 8.0, K).astype(np.float32)
        t = rng.uniform(-8.0, 8.0, K).astype(np.float32)
        want = np.exp(-1j * (s[:, None].astype(np.float64) * x[None, :]
                             + t[:, None].astype(np.float64) * y[None, :])
                      ) @ c.astype(np.complex128)
        got = np.asarray(ftt.device_get_complex(
            ftt.nufft2d3(x, y, c, s, t, isign=-1)))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-5, rel

    def test_3d3_vs_direct(self, rng):
        M, K = 70, 40
        pts = [rng.uniform(-2.0, 2.0, M).astype(np.float32) for _ in range(3)]
        c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)).astype(
            np.complex64)
        fr = [rng.uniform(-6.0, 6.0, K).astype(np.float32) for _ in range(3)]
        phase = sum(f[:, None].astype(np.float64) * p[None, :]
                    for f, p in zip(fr, pts))
        want = np.exp(1j * phase) @ c.astype(np.complex128)
        got = np.asarray(ftt.device_get_complex(
            ftt.nufft3d3(*pts, c, *fr)))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-5, rel

    def test_2d3_batched(self, rng):
        M, K = 40, 30
        x = rng.uniform(-1.0, 1.0, M).astype(np.float32)
        y = rng.uniform(-1.0, 1.0, M).astype(np.float32)
        c = (rng.standard_normal((2, M)) + 1j * rng.standard_normal((2, M))
             ).astype(np.complex64)
        s = rng.uniform(-5.0, 5.0, K).astype(np.float32)
        t = rng.uniform(-5.0, 5.0, K).astype(np.float32)
        got = np.asarray(ftt.device_get_complex(ftt.nufft2d3(x, y, c, s, t)))
        for b in range(2):
            one = np.asarray(ftt.device_get_complex(
                ftt.nufft2d3(x, y, c[b], s, t)))
            rel = np.linalg.norm(got[b] - one) / np.linalg.norm(one)
            assert rel < 1e-6, rel
