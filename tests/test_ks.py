"""Kuramoto-Sivashinsky ETDRK4 tests.

Oracle: an independent complex-f64 numpy ETDRK4 implementation
(Kassam-Trefethen scheme) on the same grid; short horizons keep the
chaotic error growth well below tolerance.  Plus structural properties:
mean conservation (the k=0 mode has zero linear and nonlinear tendency),
bounded energy in the chaotic regime, and trajectory sampling shapes.
"""

import numpy as np
import pytest

from fft_wgpu_tpu.models.ks import (
    ks_init,
    ks_rollout,
    ks_step,
    kt_initial_condition,
)


def _ks_ref(u0, length, h, steps):
    """f64 numpy ETDRK4 reference (Kassam & Trefethen 2005, kursiv.m)."""
    n = u0.shape[-1]
    v = np.fft.fft(u0.astype(np.float64), axis=-1)
    k = 2.0 * np.pi / length * np.fft.fftfreq(n, 1.0 / n)
    lin = k * k - k ** 4
    E = np.exp(h * lin)
    E2 = np.exp(h * lin / 2.0)
    m = 32
    r = np.exp(1j * np.pi * (np.arange(1, m + 1) - 0.5) / m)
    zr = h * lin[:, None] + r[None, :]
    Q = h * np.real(np.mean(np.expm1(zr / 2.0) / zr, axis=1))
    f1 = h * np.real(np.mean(
        (-4.0 - zr + np.exp(zr) * (4.0 - 3.0 * zr + zr ** 2)) / zr ** 3, axis=1))
    f2 = h * np.real(np.mean(
        (2.0 + zr + np.exp(zr) * (-2.0 + zr)) / zr ** 3, axis=1))
    f3 = h * np.real(np.mean(
        (-4.0 - 3.0 * zr - zr ** 2 + np.exp(zr) * (4.0 - zr)) / zr ** 3, axis=1))
    dealias = (np.abs(np.fft.fftfreq(n, 1.0 / n)) <= n / 3.0).astype(float)
    g = -0.5j * k * dealias

    def N(v):
        u = np.real(np.fft.ifft(v, axis=-1))
        return g * np.fft.fft(u * u, axis=-1)

    v = v * dealias
    for _ in range(steps):
        nv = N(v)
        a = E2 * v + Q * nv
        na = N(a)
        b = E2 * v + Q * na
        nb = N(b)
        c = E2 * a + Q * (2.0 * nb - nv)
        nc = N(c)
        v = E * v + f1 * nv + 2.0 * f2 * (na + nb) + f3 * nc
    return np.real(np.fft.ifft(v, axis=-1))


def test_matches_f64_reference_short_horizon():
    n, length, h = 128, 32.0 * np.pi, 0.25
    u0 = np.asarray(kt_initial_condition(n, length))
    plan = ks_init(n, length, h)
    got = np.asarray(ks_rollout(plan, u0, 20))
    ref = _ks_ref(u0, length, h, 20)
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 1e-4, err


def test_mean_conserved_and_bounded():
    n, length, h = 128, 32.0 * np.pi, 0.25
    plan = ks_init(n, length, h)
    u0 = np.asarray(kt_initial_condition(n, length))
    u = np.asarray(ks_rollout(plan, u0, 400))  # t = 100, deep in chaos
    assert abs(u.mean() - u0.mean()) < 1e-3
    # KS attractor rms is O(1); blow-up or decay-to-zero both fail this
    rms = np.sqrt((u ** 2).mean())
    assert 0.5 < rms < 5.0, rms


def test_trajectory_sampling_and_batch():
    n, length, h = 64, 16.0 * np.pi, 0.25
    plan = ks_init(n, length, h)
    u0 = np.stack([np.asarray(kt_initial_condition(n, length))] * 3)
    u0 = u0 * np.array([1.0, 0.9, 1.1], np.float32)[:, None]
    final, traj = ks_rollout(plan, u0, 40, keep_every=10)
    assert final.shape == (3, n)
    assert traj.shape == (4, 3, n)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(final),
                               rtol=0, atol=1e-6)
    # batch rows evolve independently: row 0 matches a solo rollout
    solo = np.asarray(ks_rollout(plan, u0[0], 40))
    np.testing.assert_allclose(np.asarray(final[0]), solo, atol=1e-5)
    with pytest.raises(ValueError):
        ks_rollout(plan, u0, 41, keep_every=10)


def test_single_step_matches_reference():
    n, length, h = 64, 16.0 * np.pi, 0.1
    plan = ks_init(n, length, h)
    u0 = np.asarray(kt_initial_condition(n, length))
    got = np.asarray(ks_rollout(plan, u0, 1))
    ref = _ks_ref(u0, length, h, 1)
    assert np.max(np.abs(got - ref)) < 1e-5
