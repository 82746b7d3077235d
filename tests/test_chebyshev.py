"""Chebyshev spectral ops vs numpy.polynomial.chebyshev + analytic
oracles."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt

C = np.polynomial.chebyshev


class TestTransform:
    def test_coeffs_recover_polynomial(self):
        # u = 0.5 T0 + 2 T1 - 1.5 T3 + 0.25 T5 sampled at cheb points
        coef = np.array([0.5, 2.0, 0.0, -1.5, 0.0, 0.25])
        n = 8
        x = np.asarray(ftt.cheb_points(n), np.float64)
        u = C.chebval(x, coef).astype(np.float32)
        a = np.asarray(ftt.cheb_coeffs(u), np.float64)
        np.testing.assert_allclose(a[:6], coef, atol=2e-6)
        np.testing.assert_allclose(a[6:], 0.0, atol=2e-6)

    def test_roundtrip(self, rng):
        u = rng.standard_normal((4, 33)).astype(np.float32)
        v = np.asarray(ftt.cheb_values(ftt.cheb_coeffs(u)))
        np.testing.assert_allclose(v, u, atol=1e-5)

    def test_axis(self, rng):
        u = rng.standard_normal((17, 3)).astype(np.float32)
        a0 = np.asarray(ftt.cheb_coeffs(u, axis=0))
        a1 = np.asarray(ftt.cheb_coeffs(u.T, axis=1))
        np.testing.assert_allclose(a0, a1.T, atol=1e-6)


class TestDerivative:
    def test_vs_chebder(self, rng):
        coef = rng.standard_normal(10)
        n = 16
        x = np.asarray(ftt.cheb_points(n), np.float64)
        u = C.chebval(x, coef).astype(np.float32)
        got = np.asarray(ftt.cheb_derivative(u), np.float64)
        want = C.chebval(x, C.chebder(coef))
        np.testing.assert_allclose(got, want, atol=1e-4 * np.abs(want).max())

    def test_exp_derivative(self):
        n = 32
        x = np.asarray(ftt.cheb_points(n), np.float64)
        u = np.exp(x).astype(np.float32)
        got = np.asarray(ftt.cheb_derivative(u), np.float64)
        rel = np.linalg.norm(got - np.exp(x)) / np.linalg.norm(np.exp(x))
        # f32 floor: differentiation amplifies coefficient noise ~O(n^2)
        assert rel < 5e-5, rel

    def test_second_order_and_interval(self):
        # f = sin(t) on [0, pi]: f'' = -sin(t)
        n = 24
        a, b = 0.0, np.pi
        xs = np.asarray(ftt.cheb_points(n), np.float64)
        t = (xs + 1) * (b - a) / 2 + a
        u = np.sin(t).astype(np.float32)
        got = np.asarray(ftt.cheb_derivative(u, order=2, interval=(a, b)),
                         np.float64)
        rel = np.linalg.norm(got + np.sin(t)) / np.linalg.norm(np.sin(t))
        # double differentiation squares the f32 noise amplification
        assert rel < 1e-3, rel

    def test_batched(self, rng):
        u = rng.standard_normal((3, 21)).astype(np.float32)
        got = np.asarray(ftt.cheb_derivative(u))
        for i in range(3):
            want = np.asarray(ftt.cheb_derivative(u[i]))
            np.testing.assert_allclose(got[i], want, rtol=1e-4,
                                       atol=1e-6 * np.abs(want).max())


class TestQuadrature:
    def test_polynomial_exactness(self):
        # CC with n+1 points integrates degree-n polynomials exactly
        n = 8
        w = np.asarray(ftt.clenshaw_curtis_weights(n), np.float64)
        x = np.asarray(ftt.cheb_points(n), np.float64)
        for deg in range(n + 1):
            got = w @ x ** deg
            want = (1 - (-1) ** (deg + 1)) / (deg + 1)
            np.testing.assert_allclose(got, want, atol=1e-6)

    def test_exp_integral(self):
        n = 24
        x = np.asarray(ftt.cheb_points(n), np.float64)
        got = float(ftt.cheb_integrate(np.exp(x).astype(np.float32)))
        want = np.e - 1 / np.e
        assert abs(got - want) < 1e-5

    def test_interval_and_axis(self):
        # int_0^3 t^2 dt = 9
        n = 10
        xs = np.asarray(ftt.cheb_points(n), np.float64)
        t = (xs + 1) * 1.5
        u = np.stack([t * t, np.ones_like(t)]).astype(np.float32)
        got = np.asarray(ftt.cheb_integrate(u, axis=-1, interval=(0, 3)))
        np.testing.assert_allclose(got, [9.0, 3.0], atol=1e-5)
