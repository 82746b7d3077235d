"""Distributed 3-D Navier-Stokes model tests (8-device virtual CPU mesh).

Oracles:
* ABC flow is a Beltrami field (curl u = u): its Lamb vector vanishes, so
  the exact solution is pure viscous decay u(t) = u0 exp(-nu t), which the
  spectral integrating factor reproduces to FFT roundoff.
* An independent single-device jnp.fft implementation of the same discrete
  scheme (rotational form + Leray projection + integrating-factor Heun)
  must match the distributed rollout step for step.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fft_wgpu_tpu.models.ns3d import (
    abc_flow,
    ns3d_init,
    ns3d_rollout,
)


def _jnp_reference_rollout(u0, n, nu, dt, steps):
    """Same scheme via jnp.fft.rfftn/irfftn on one device (numpy-style)."""
    kx = np.fft.fftfreq(n, 1.0 / n).astype(np.float32)[:, None, None]
    ky = np.fft.fftfreq(n, 1.0 / n).astype(np.float32)[None, :, None]
    kz = np.fft.rfftfreq(n, 1.0 / n).astype(np.float32)[None, None, :]
    ksq = kx * kx + ky * ky + kz * kz
    ksq_safe = np.where(ksq == 0.0, 1.0, ksq)
    cut = n / 3.0
    mask = ((np.abs(kx) <= cut) & (np.abs(ky) <= cut)
            & (kz <= cut)).astype(np.float32)
    E = np.exp(-nu * ksq * dt).astype(np.float32)

    def rfft3(x):
        return jnp.fft.rfftn(x, axes=(-3, -2, -1))

    def irfft3(X):
        return jnp.fft.irfftn(X, s=(n, n, n), axes=(-3, -2, -1))

    def project(F):
        div = (kx * F[0] + ky * F[1] + kz * F[2]) / ksq_safe
        return jnp.stack([F[0] - kx * div, F[1] - ky * div,
                          F[2] - kz * div])

    def nonlinear(U):
        W = jnp.stack([
            1j * (ky * U[2] - kz * U[1]),
            1j * (kz * U[0] - kx * U[2]),
            1j * (kx * U[1] - ky * U[0]),
        ])
        u = jnp.stack([irfft3(U[i]) for i in range(3)])
        w = jnp.stack([irfft3(W[i]) for i in range(3)])
        lamb = jnp.stack([
            u[1] * w[2] - u[2] * w[1],
            u[2] * w[0] - u[0] * w[2],
            u[0] * w[1] - u[1] * w[0],
        ])
        F = jnp.stack([rfft3(lamb[i]) for i in range(3)]) * mask
        return project(F)

    U = jnp.stack([rfft3(u0[i]) for i in range(3)]) * mask
    U = project(U)
    for _ in range(steps):
        N1 = nonlinear(U)
        P = (U + dt * N1) * E
        N2 = nonlinear(P)
        U = U * E + 0.5 * dt * (N1 * E + N2)
    return np.stack([np.asarray(irfft3(U[i])) for i in range(3)])


def test_abc_flow_is_beltrami():
    """curl(abc) == abc on the grid (spectral curl, machine precision)."""
    n = 16
    u = np.asarray(abc_flow(n), np.float64)
    U = np.fft.rfftn(u, axes=(-3, -2, -1))
    kx = np.fft.fftfreq(n, 1.0 / n)[:, None, None]
    ky = np.fft.fftfreq(n, 1.0 / n)[None, :, None]
    kz = np.fft.rfftfreq(n, 1.0 / n)[None, None, :]
    curl = np.stack([
        1j * (ky * U[2] - kz * U[1]),
        1j * (kz * U[0] - kx * U[2]),
        1j * (kx * U[1] - ky * U[0]),
    ])
    assert np.linalg.norm(curl - U) / np.linalg.norm(U) < 1e-6


def test_abc_viscous_decay_exact(assert_close):
    """Lamb vector of a Beltrami flow vanishes -> exact exp(-nu t) decay."""
    n, nu, dt, steps = 16, 0.05, 0.1, 6
    c = ns3d_init(n, nu, dt)
    u0 = abc_flow(n)
    u = ns3d_rollout(c, u0, steps)
    expect = np.asarray(u0) * np.exp(-nu * dt * steps, dtype=np.float32)
    assert_close(np.asarray(u), expect, 5e-5, "(ABC viscous decay)")


def test_matches_single_device_reference(assert_close):
    """Distributed pencil rollout == independent jnp.fft scheme."""
    n, nu, dt, steps = 16, 0.02, 0.05, 3
    rng = np.random.default_rng(7)
    u0 = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    c = ns3d_init(n, nu, dt)
    got = np.asarray(ns3d_rollout(c, u0, steps))
    want = _jnp_reference_rollout(u0, n, nu, dt, steps)
    assert_close(got, want, 2e-5, "(vs jnp.fft reference scheme)")


def test_divergence_free_and_energy_decay():
    """Rollout output stays solenoidal; unforced energy decays."""
    n, nu, dt = 16, 0.05, 0.05
    rng = np.random.default_rng(3)
    u0 = jnp.asarray(rng.standard_normal((3, n, n, n)).astype(np.float32))
    c = ns3d_init(n, nu, dt)
    u1 = np.asarray(ns3d_rollout(c, u0, 2))
    u2 = np.asarray(ns3d_rollout(c, u0, 5))
    U = np.fft.rfftn(u2, axes=(-3, -2, -1))
    kx = np.fft.fftfreq(n, 1.0 / n)[:, None, None]
    ky = np.fft.fftfreq(n, 1.0 / n)[None, :, None]
    kz = np.fft.rfftfreq(n, 1.0 / n)[None, None, :]
    div = kx * U[0] + ky * U[1] + kz * U[2]
    assert np.abs(div).max() / np.abs(U).max() < 1e-4
    e1 = float((u1 ** 2).sum())
    e2 = float((u2 ** 2).sum())
    assert e2 < e1, "unforced flow must lose energy"


def test_rollout_cache_replays():
    n = 16
    c = ns3d_init(n, 0.05, 0.05)
    u0 = abc_flow(n)
    a = np.asarray(ns3d_rollout(c, u0, 2))
    assert c._jit_cache  # compiled program cached
    b = np.asarray(ns3d_rollout(c, u0, 2))
    np.testing.assert_array_equal(a, b)


def test_ns3d_bf16_comm_close_to_exact():
    """One ABC-flow step with bf16 wire turns stays within bf16 rounding
    of the exact-f32 step (the comm_dtype plumbing reaches all 18
    distributed transforms)."""
    import jax.numpy as jnp
    import numpy as np
    from fft_wgpu_tpu.models import abc_flow, ns3d_init, ns3d_rollout

    n = 16
    u0 = abc_flow(n)
    exact = ns3d_init(n, nu=0.01, dt=1e-3)
    bf16 = ns3d_init(n, nu=0.01, dt=1e-3, comm_dtype=jnp.bfloat16)
    ue = np.asarray(ns3d_rollout(exact, u0, 2))
    ub = np.asarray(ns3d_rollout(bf16, u0, 2))
    rel = np.linalg.norm(ub - ue) / np.linalg.norm(ue)
    assert rel < 2e-2, rel
    assert rel > 0.0  # the bf16 wire path was genuinely taken
