"""Pseudo-spectral Burgers solver vs the exact Cole-Hopf solution."""

import numpy as np
import pytest

import jax

from fft_wgpu_tpu.models.burgers import (
    burgers_init,
    burgers_rollout,
    cole_hopf_solution,
    random_initial_condition,
)


def test_cole_hopf_exact():
    """u = -2 nu phi_x / phi with phi = 1 + eps e^{-nu t} cos x is an
    exact solution; the RK2 stepper must track it to O(dt^2)."""
    n, nu, eps = 256, 0.1, 0.8
    t_end = 1.0
    steps = 200
    c = burgers_init(n, nu, t_end / steps)
    u0 = cole_hopf_solution(n, nu, eps, 0.0)
    got = np.asarray(burgers_rollout(c, u0, steps))
    want = np.asarray(cole_hopf_solution(n, nu, eps, t_end))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-4, rel


def test_dt_convergence():
    """Halving dt must shrink the Cole-Hopf error ~4x (2nd order)."""
    # strong-decay regime so RK2 truncation sits well above the f32
    # floor (at gentle nu/dt the scheme is already ~1e-6 accurate and
    # roundoff accumulation hides the order)
    n, nu, eps, t_end = 128, 0.4, 0.9, 2.0
    want = np.asarray(cole_hopf_solution(n, nu, eps, t_end))

    def err(steps):
        c = burgers_init(n, nu, t_end / steps)
        got = np.asarray(burgers_rollout(
            c, cole_hopf_solution(n, nu, eps, 0.0), steps))
        return np.linalg.norm(got - want) / np.linalg.norm(want)

    assert err(16) < err(8) / 3.0
    assert err(64) < err(32) / 3.0


def test_batched_rollout_and_dissipation():
    """Batched GRF rollout: shape preserved, energy decays, mean stays 0."""
    n, batch = 256, 4
    c = burgers_init(n, 0.02, 1e-3)
    u0 = random_initial_condition(jax.random.PRNGKey(0), n, batch=batch)
    assert u0.shape == (batch, n)
    u1 = burgers_rollout(c, u0, 100)
    assert u1.shape == (batch, n)
    e0 = np.sum(np.asarray(u0) ** 2, axis=-1)
    e1 = np.sum(np.asarray(u1) ** 2, axis=-1)
    assert np.all(e1 < e0)  # viscous dissipation
    assert np.allclose(np.asarray(u1).mean(axis=-1), 0.0, atol=1e-5)


def test_shock_steepening_stays_stable():
    """A steep sine at low viscosity forms a shock; the dealiased scheme
    must stay finite and keep dissipating."""
    n = 512
    c = burgers_init(n, 0.01, 5e-4)
    x = np.arange(n, dtype=np.float32) * (2 * np.pi / n)
    u0 = np.sin(x).astype(np.float32)
    u = burgers_rollout(c, u0, 2000)  # t = 1.0, past shock formation
    u = np.asarray(u)
    assert np.all(np.isfinite(u))
    assert np.abs(u).max() < 1.01  # max principle (no blow-up)


def test_fno_learns_burgers_operator():
    """End-to-end model-family integration: generate GRF -> Burgers
    rollout pairs with the solver, train FNO1d on u0 -> u(T), and require
    a large loss drop (the full pipeline: data gen, R2C/C2R, AD)."""
    from fft_wgpu_tpu.models.spectral import init_fno1d, train_step, mse_loss

    n, batch = 128, 16
    c = burgers_init(n, 0.05, 2e-3)
    u0 = random_initial_condition(jax.random.PRNGKey(1), n, batch=batch)
    uT = burgers_rollout(c, u0, 50)
    x = np.asarray(u0)[..., None].astype(np.float32)
    y = np.asarray(uT)[..., None].astype(np.float32)

    params = init_fno1d(jax.random.PRNGKey(0), modes=16, width=16, depth=2)
    first = float(mse_loss(params, x, y))
    for _ in range(100):
        params, loss = train_step(params, x, y, lr=1e-2)
    last = float(loss)
    assert last < 0.2 * first, (first, last)
