"""Fractional Fourier transform: direct continuous-kernel oracle in the
well-conditioned interval + exact group/eigenfunction properties.

The quadrature oracle is only valid where its chirp kernel is adequately
sampled (|cot|, |csc| <= ~sqrt(2), i.e. a in ~[0.6, 1.4] — outside, the
algorithm's branch reduction exists precisely because the direct form
aliases); elsewhere the transform is pinned by exact additivity,
unitarity, and the integer-order operators."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def _grid(n):
    return (np.arange(n) - n // 2) / np.sqrt(n)


def _sig(n, seed=0):
    x = _grid(n)
    rng = np.random.default_rng(seed)
    return (np.exp(-x * x) * (1 + 0.3 * np.cos(2 * np.pi * x))
            + 0.1 * np.exp(-((x - 1.0) ** 2))).astype(np.complex64)


def _direct(f, a):
    """Quadrature of the continuous FrFT kernel (f64)."""
    f = np.asarray(f, complex)
    n = len(f)
    alpha = np.mod(a, 4.0) * np.pi / 2
    x = _grid(n)
    cot, csc = 1 / np.tan(alpha), 1 / np.sin(alpha)
    A = np.exp(-1j * (np.pi * np.sign(np.sin(alpha)) / 4 - alpha / 2)
               ) / np.sqrt(abs(np.sin(alpha)))
    K = A * np.exp(1j * np.pi * (cot * (x[:, None] ** 2 + x[None, :] ** 2)
                                 - 2 * csc * x[:, None] * x[None, :]))
    return K @ f / np.sqrt(n)


def _rel(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(b)


class TestOracle:
    @pytest.mark.parametrize("a", [0.6, 0.8, 1.0, 1.25, 1.4])
    def test_core_interval_vs_kernel_quadrature(self, a):
        f = _sig(128)
        assert _rel(ftt.frft(f, a), _direct(f, a)) < 2e-5

    @pytest.mark.parametrize("n", [64, 100, 257])
    def test_sizes(self, n):
        f = _sig(n, seed=n)
        assert _rel(ftt.frft(f, 0.9), _direct(f, 0.9)) < 5e-5

    def test_gaussian_eigenfunction(self):
        # exp(-pi x^2) is the order-0 Hermite eigenfunction: invariant
        x = _grid(256)
        g = np.exp(-np.pi * x * x).astype(np.complex64)
        for a in (0.7, 1.3):
            assert _rel(ftt.frft(g, a), g) < 2e-5


class TestGroup:
    def test_integer_orders(self):
        f = _sig(128)
        n = 128
        shft = (np.arange(n) + n // 2) % n
        want1 = np.empty(n, complex)
        want1[shft] = np.fft.fft(f[shft]) / np.sqrt(n)
        assert _rel(ftt.frft(f, 0.0), f) < 1e-7
        assert _rel(ftt.frft(f, 1.0), want1) < 1e-6
        parity = np.concatenate([f[:1], f[1:][::-1]])
        assert _rel(ftt.frft(f, 2.0), parity) < 1e-7
        want3 = np.empty(n, complex)
        want3[shft] = np.fft.ifft(f[shft]) * np.sqrt(n)
        assert _rel(ftt.frft(f, 3.0), want3) < 1e-6

    @pytest.mark.parametrize("a,b", [(0.6, 0.7), (1.7, 0.9), (3.2, 0.8),
                                     (0.9, -0.4)])
    def test_additivity(self, a, b):
        f = _sig(128)
        g1 = ftt.frft(ftt.frft(f, a), b)
        g2 = ftt.frft(f, a + b)
        assert _rel(g1, g2) < 5e-5

    @pytest.mark.parametrize("a", [0.8, 1.7, 2.6, 3.3])
    def test_roundtrip_and_unitarity(self, a):
        f = _sig(192)
        F = ftt.frft(f, a)
        assert abs(np.linalg.norm(np.asarray(F)) / np.linalg.norm(f) - 1) < 1e-5
        assert _rel(ftt.frft(F, -a), f) < 5e-5

    def test_batched_and_axis(self):
        f = np.stack([_sig(128, seed=i) for i in range(3)])
        F = np.asarray(ftt.frft(f, 0.9))
        for i in range(3):
            assert _rel(F[i], ftt.frft(f[i], 0.9)) < 1e-6
        Ft = np.asarray(ftt.frft(f.T, 0.9, axis=0))
        assert _rel(Ft.T, F) < 1e-6

    def test_real_input_promotes(self):
        x = _grid(64)
        f = np.exp(-x * x).astype(np.float32)
        F = np.asarray(ftt.frft(f, 1.0))
        assert F.dtype == np.complex64
        assert _rel(F, _direct(f, 1.0)) < 1e-5


class TestFrft2:
    def test_order1_is_centered_2d_dft(self):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal((32, 32))
             + 1j * rng.standard_normal((32, 32))).astype(np.complex64)
        got = np.asarray(ftt.frft2(x, 1.0))
        n = 32
        shft = (np.arange(n) + n // 2) % n
        g = x[np.ix_(shft, shft)]
        F = np.fft.fft2(g) / n
        want = np.empty_like(F)
        want[np.ix_(shft, shft)] = F
        assert _rel(got, want) < 1e-5

    def test_separable_orders_and_roundtrip(self):
        # admissible (TF-concentrated) 2-D signal — see module docstring
        # n large enough that the Gaussian envelope is well-contained in
        # the +-sqrt(n)/2 grid (admissibility truncation ~exp(-n/4))
        x = np.outer(_sig(64, seed=4), _sig(96, seed=5)).astype(np.complex64)
        F = ftt.frft2(x, (0.7, 1.2))
        seq = ftt.frft(ftt.frft(x, 0.7, axis=0), 1.2, axis=1)
        assert _rel(np.asarray(F), np.asarray(seq)) < 1e-7
        rec = ftt.frft2(F, (-0.7, -1.2))
        assert _rel(np.asarray(rec), x) < 1e-4

    def test_noise_is_inadmissible_but_integer_orders_exact(self):
        # document the admissibility caveat: broadband noise loses TF
        # corner content at fractional orders, but integer orders stay
        # exact for every input
        rng = np.random.default_rng(6)
        x = (rng.standard_normal(64)
             + 1j * rng.standard_normal(64)).astype(np.complex64)
        rec = ftt.frft(ftt.frft(x, 0.7), -0.7)
        assert _rel(np.asarray(rec), x) > 1e-2  # genuinely lossy
        n = 64
        shft = (np.arange(n) + n // 2) % n
        want = np.empty(n, complex)
        want[shft] = np.fft.fft(x[shft]) / np.sqrt(n)
        assert _rel(np.asarray(ftt.frft(x, 1.0)), want) < 1e-6


class TestDfrft:
    """Eigenvector-method discrete FrFT: exact group properties on ANY
    input (no admissibility caveat)."""

    def test_noise_unitary_additive_invertible(self):
        rng = np.random.default_rng(7)
        x = (rng.standard_normal(128)
             + 1j * rng.standard_normal(128)).astype(np.complex64)
        F = np.asarray(ftt.dfrft(x, 0.37))
        assert abs(np.linalg.norm(F) / np.linalg.norm(x) - 1) < 1e-5
        g1 = ftt.dfrft(ftt.dfrft(x, 0.6), 0.7)
        g2 = ftt.dfrft(x, 1.3)
        assert _rel(np.asarray(g1), np.asarray(g2)) < 1e-5
        rec = ftt.dfrft(ftt.dfrft(x, 0.8), -0.8)
        assert _rel(np.asarray(rec), x) < 1e-5

    @pytest.mark.parametrize("n", [16, 17, 100, 128])
    def test_integer_orders(self, n):
        rng = np.random.default_rng(n)
        x = (rng.standard_normal(n)
             + 1j * rng.standard_normal(n)).astype(np.complex64)
        assert _rel(np.asarray(ftt.dfrft(x, 0.0)), x) < 1e-6
        assert _rel(np.asarray(ftt.dfrft(x, 1.0)),
                    np.fft.fft(x) / np.sqrt(n)) < 1e-5
        parity = np.concatenate([x[:1], x[1:][::-1]])
        assert _rel(np.asarray(ftt.dfrft(x, 2.0)), parity) < 1e-5
        assert _rel(np.asarray(ftt.dfrft(x, 3.0)),
                    np.fft.ifft(x) * np.sqrt(n)) < 1e-5

    def test_batched_and_axis(self):
        rng = np.random.default_rng(9)
        x = (rng.standard_normal((3, 64))
             + 1j * rng.standard_normal((3, 64))).astype(np.complex64)
        F = np.asarray(ftt.dfrft(x, 0.9))
        for i in range(3):
            assert _rel(F[i], np.asarray(ftt.dfrft(x[i], 0.9))) < 1e-6
        Ft = np.asarray(ftt.dfrft(x.T, 0.9, axis=0))
        assert _rel(Ft.T, F) < 1e-6

    def test_hermite_ground_state_near_invariant(self):
        # the h=0 eigenvector is exactly invariant by construction; the
        # sampled continuous Gaussian is close to it for moderate n
        from fft_wgpu_tpu.ops.frft import _dfrft_basis

        V, h = _dfrft_basis(64)
        v0 = V[:, list(h).index(0)].astype(np.complex64)
        F = np.asarray(ftt.dfrft(v0, 0.53))
        assert _rel(F, v0) < 1e-5
