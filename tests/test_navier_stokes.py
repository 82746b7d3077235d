"""Pseudo-spectral 2-D Navier-Stokes stepper (models/navier_stokes.py).

Oracles: the Taylor-Green vortex (exact analytic decay — its nonlinear
term vanishes identically) and conservation/symmetry sanity checks.
"""

import numpy as np

import jax.numpy as jnp

from fft_wgpu_tpu.models import navier_stokes as ns


def test_taylor_green_exact_decay(assert_close):
    n, nu, dt, steps, k = 64, 0.02, 0.01, 50, 2
    c = ns.ns2d_init(n, nu, dt)
    w0 = ns.taylor_green_vorticity(n, k)
    wT = ns.ns2d_rollout(c, w0, steps)
    want = np.asarray(w0) * np.exp(-2.0 * k * k * nu * dt * steps)
    assert_close(np.asarray(wT), want, tol=1e-4, what="Taylor-Green decay")


def test_rollout_stays_real_and_bounded(rng):
    n = 64
    c = ns.ns2d_init(n, nu=1e-3, dt=5e-3)
    w0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    w0 = w0 - jnp.mean(w0)  # zero-mean vorticity
    wT = ns.ns2d_rollout(c, w0, 20)
    a = np.asarray(wT)
    assert np.all(np.isfinite(a))
    # enstrophy must not grow (viscous, dealiased, unforced)
    assert float(np.sum(a * a)) <= float(np.sum(np.asarray(w0) ** 2)) * 1.01


def test_mean_vorticity_conserved(rng):
    """The k=0 mode is invariant (no forcing, advection has no mean)."""
    n = 32
    c = ns.ns2d_init(n, nu=5e-3, dt=1e-2)
    w0 = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32))
    wT = ns.ns2d_rollout(c, w0, 10)
    assert abs(float(jnp.mean(wT)) - float(jnp.mean(w0))) < 1e-5
