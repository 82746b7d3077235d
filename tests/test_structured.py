"""Structured FFT linear algebra vs scipy.linalg oracles."""

import jax
import numpy as np
import pytest

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu.ops.structured import (
    circulant_matvec,
    circulant_solve,
    grf_sample,
    toeplitz_matvec,
    toeplitz_solve,
)

sla = pytest.importorskip("scipy.linalg")


def test_circulant_matvec(rng, assert_close):
    n = 64
    c = rng.standard_normal(n).astype(np.float32)
    x = rng.standard_normal((3, n)).astype(np.float32)
    got = np.asarray(circulant_matvec(c, x))
    want = x.astype(np.float64) @ sla.circulant(c).T
    assert_close(got, want, 1e-5)


def test_circulant_solve_roundtrip(rng, assert_close):
    n = 48
    # diagonally dominant -> well conditioned
    c = rng.standard_normal(n).astype(np.float32)
    c[0] += n
    b = rng.standard_normal((2, n)).astype(np.float32)
    x = np.asarray(circulant_solve(c, b))
    want = np.linalg.solve(sla.circulant(c), b.astype(np.float64).T).T
    assert_close(x, want, 1e-5)


def test_toeplitz_matvec(rng, assert_close):
    n = 50
    c = rng.standard_normal(n).astype(np.float32)
    r = rng.standard_normal(n).astype(np.float32)
    r[0] = c[0]
    x = rng.standard_normal((4, n)).astype(np.float32)
    got = np.asarray(toeplitz_matvec(c, r, x))
    want = x.astype(np.float64) @ sla.toeplitz(c, r).T
    assert_close(got, want, 1e-5)


def test_toeplitz_solve_spd(rng, assert_close):
    n = 96
    # SPD Toeplitz: exponential covariance
    c = np.exp(-np.arange(n) / 7.0).astype(np.float32)
    b = rng.standard_normal((2, n)).astype(np.float32)
    x = np.asarray(toeplitz_solve(c, b))
    want = np.stack([sla.solve_toeplitz(c.astype(np.float64), bi)
                     for bi in b.astype(np.float64)])
    assert_close(x, want, 1e-4, "(PCG vs scipy solve_toeplitz)")


def test_toeplitz_solve_single_rhs(rng, assert_close):
    n = 40
    c = np.exp(-((np.arange(n) / 5.0) ** 2)).astype(np.float32)
    c[0] += 0.01  # nugget keeps the Gaussian kernel invertible
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(toeplitz_solve(c, b))
    want = sla.solve_toeplitz(c.astype(np.float64), b.astype(np.float64))
    assert_close(x, want, 1e-3)


def test_grf_exact_covariance():
    """Sample covariance of circulant-embedding GRF matches the acf."""
    n = 32
    acf = np.exp(-np.arange(n) / 5.0)
    num = 8192
    s = np.asarray(grf_sample(acf, jax.random.PRNGKey(0), num))
    assert s.shape == (num, n)
    # average over all diagonal pairs for each lag
    emp = np.array([
        np.mean([np.mean(s[:, i] * s[:, i + k]) for i in range(n - k)])
        for k in range(8)
    ])
    assert np.abs(emp - acf[:8]).max() < 0.06


def test_grf_rejects_indefinite_embedding():
    # a hard-truncated long-range acf whose minimal embedding goes
    # negative definite
    n = 24
    acf = 1.0 - np.arange(n) / 6.0
    with pytest.raises(ValueError, match="nonnegative definite"):
        grf_sample(acf, jax.random.PRNGKey(0))


def test_validation(rng):
    with pytest.raises(ValueError):
        circulant_matvec(np.ones((2, 2), np.float32), np.ones(2, np.float32))
    with pytest.raises(ValueError):
        circulant_solve(np.ones(4, np.float32), np.ones(5, np.float32))
    with pytest.raises(ValueError):
        toeplitz_matvec(np.ones(4, np.float32), np.ones(5, np.float32),
                        np.ones(4, np.float32))
    with pytest.raises(ValueError):
        grf_sample(np.ones(1), jax.random.PRNGKey(0))


class TestBCCB:
    def _dense_bccb(self, k):
        """Dense BCCB matrix from kernel k [m, n] (circular 2-D conv)."""
        m, n = k.shape
        B = np.zeros((m * n, m * n))
        for i in range(m):
            for j in range(n):
                for p in range(m):
                    for q in range(n):
                        B[i * n + j, p * n + q] = k[(i - p) % m, (j - q) % n]
        return B

    def test_matvec_vs_dense(self, rng):
        k = rng.standard_normal((6, 8)).astype(np.float32)
        x = rng.standard_normal((6, 8)).astype(np.float32)
        got = np.asarray(ftt.bccb_matvec(k, x)).ravel()
        want = self._dense_bccb(np.asarray(k, np.float64)) @ x.astype(
            np.float64).ravel()
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5

    def test_solve_roundtrip(self, rng):
        # well-conditioned kernel: dominant center tap
        k = (0.05 * rng.standard_normal((8, 8))).astype(np.float32)
        k[0, 0] += 1.0
        x = rng.standard_normal((3, 8, 8)).astype(np.float32)
        y = np.asarray(ftt.bccb_matvec(k, x))
        rec = np.asarray(ftt.bccb_solve(k, y))
        assert np.linalg.norm(rec - x) / np.linalg.norm(x) < 1e-5

    def test_tikhonov_deblur(self, rng):
        # Gaussian blur kernel (periodic), noisy observation
        m = n = 32
        yy, xx = np.meshgrid(np.arange(m), np.arange(n), indexing="ij")
        d2 = (np.minimum(yy, m - yy) ** 2 + np.minimum(xx, n - xx) ** 2)
        k = np.exp(-d2 / (2 * 1.0 ** 2)).astype(np.float32)
        k /= k.sum()
        x = np.zeros((m, n), np.float32)
        x[8:24, 8:24] = 1.0
        y = np.array(ftt.bccb_matvec(k, x))
        y += 1e-3 * rng.standard_normal(y.shape).astype(np.float32)
        rec = np.asarray(ftt.bccb_solve(k, y, reg=1e-4))
        blurred_err = np.linalg.norm(y - x)
        rec_err = np.linalg.norm(rec - x)
        assert rec_err < 0.5 * blurred_err

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            ftt.bccb_matvec(np.ones((4, 4), np.float32),
                            np.ones((4, 5), np.float32))
