"""Pseudo-spectral 1-D viscous Burgers equation on the FFT stack.

    u_t + u u_x = nu u_xx   on [0, 2pi), periodic

The classic FNO benchmark problem (the model family's data-generating
solver, alongside models/navier_stokes.py; the reference ships no models
— SURVEY §1).  Spectral form with the advection in conservation form:

    d/dt u_hat = -(ik/2) (u^2)_hat - nu k^2 u_hat

integrated exactly for the viscous term (integrating factor) and with
Heun RK2 for the nonlinear term, 2/3-rule dealiased — the same scheme as
the 2-D Navier-Stokes stepper.  State is the SPLIT (re, im) half
spectrum; batched leading dims ride the batched R2C/C2R kernels.

Validated against the exact Cole-Hopf solution (tests/test_burgers.py):
phi = 1 + eps e^{-nu t} cos x  =>  u = 2 nu eps e^{-nu t} sin x / phi.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rfft import irfft_last_split, rfft_last_split

__all__ = ["BurgersPlan", "burgers_init", "burgers_step", "burgers_rollout",
           "cole_hopf_solution", "random_initial_condition"]


class BurgersPlan:
    """Immutable stepper config; compiled rollouts cached per step count
    (plan-object semantics — build once, replay many)."""

    def __init__(self, consts):
        self._consts = consts
        self._jit_cache = {}

    def __getitem__(self, key):
        return self._consts[key]


def burgers_init(n: int, nu: float, dt: float) -> BurgersPlan:
    """Precompute wavenumbers, dealias mask, and the exact viscous
    integrating factor for an n-point grid on [0, 2pi)."""
    k = np.fft.rfftfreq(n, 1.0 / n).astype(np.float32)  # 0..n/2
    mask = (k <= n / 3.0).astype(np.float32)
    visc = np.exp(-nu * k * k * dt).astype(np.float32)
    return BurgersPlan({
        "n": n, "dt": dt, "k": jnp.asarray(k), "mask": jnp.asarray(mask),
        "visc": jnp.asarray(visc),
    })


def _nonlinear(c, ur, ui):
    """N(u)_hat = -(ik/2) (u^2)_hat, dealiased, from the split spectrum."""
    n, k, m = c["n"], c["k"], c["mask"]
    u = irfft_last_split(ur, ui, n, 1.0 / n)
    ar, ai = rfft_last_split(u * u, None)
    # multiply by -(ik/2): (r, i) -> (k*i/2, -k*r/2), then dealias
    return 0.5 * k * ai * m, -0.5 * k * ar * m


def burgers_step(c, ur, ui):
    """One Heun (RK2) step with exact viscous decay, split state."""
    dt, visc = c["dt"], c["visc"]
    n1r, n1i = _nonlinear(c, ur, ui)
    pr = (ur + dt * n1r) * visc
    pi = (ui + dt * n1i) * visc
    n2r, n2i = _nonlinear(c, pr, pi)
    ur2 = ur * visc + 0.5 * dt * (n1r * visc + n2r)
    ui2 = ui * visc + 0.5 * dt * (n1i * visc + n2i)
    return ur2, ui2


def burgers_rollout(c, u0, steps: int):
    """Integrate real u0 [..., n] for `steps` steps inside one jitted
    lax.scan; returns the real field at t = steps * dt.  Batched leading
    dims run through the batched R2C/C2R pipeline unchanged."""
    cache = c._jit_cache
    run = cache.get(steps)
    if run is None:

        @jax.jit
        def run(u0):
            ur, ui = rfft_last_split(u0, None)
            m = c["mask"]
            ur, ui = ur * m, ui * m

            def body(carry, _):
                return burgers_step(c, *carry), None

            (ur, ui), _ = jax.lax.scan(body, (ur, ui), None, length=steps)
            return irfft_last_split(ur, ui, c["n"], 1.0 / c["n"])

        cache[steps] = run
    return run(u0)


def cole_hopf_solution(n: int, nu: float, eps: float, t: float):
    """Exact single-mode Cole-Hopf solution u(x, t) on the n-point grid:
    phi = 1 + eps e^{-nu t} cos x, u = 2 nu (eps e^{-nu t} sin x) / phi
    (u = -2 nu phi_x / phi solves Burgers when phi solves the heat
    equation).  Requires |eps| < 1."""
    x = np.arange(n, dtype=np.float64) * (2.0 * np.pi / n)
    e = eps * np.exp(-nu * t)
    u = 2.0 * nu * e * np.sin(x) / (1.0 + e * np.cos(x))
    return jnp.asarray(u.astype(np.float32))


def random_initial_condition(key, n: int, batch: int = 1, scale: float = 1.0,
                             decay: float = 2.0):
    """FNO-style Gaussian-random-field initial conditions [batch, n]:
    spectrum ~ scale * (1 + k^2)^(-decay/2) with random phases, zero mean."""
    k = np.fft.rfftfreq(n, 1.0 / n).astype(np.float32)
    amp = scale * (1.0 + k * k) ** (-decay / 2.0)
    kr, ki = jax.random.split(key)
    cr = jax.random.normal(kr, (batch, k.size), jnp.float32) * amp
    ci = jax.random.normal(ki, (batch, k.size), jnp.float32) * amp
    cr = cr.at[:, 0].set(0.0)  # zero mean
    ci = ci.at[:, 0].set(0.0)
    if n % 2 == 0:
        ci = ci.at[:, -1].set(0.0)  # real Nyquist
    return irfft_last_split(cr, ci, n, 1.0)
