"""Pseudo-spectral 1-D Kuramoto-Sivashinsky equation with an ETDRK4
exponential integrator.

    u_t = -u u_x - u_xx - u_xxxx   on [0, L), periodic

The canonical stiff chaotic PDE benchmark (Kassam & Trefethen 2005).
Linear part L(k) = k^2 - k^4 spans ~8 orders of magnitude at n=1024, so
explicit RK is hopeless; ETDRK4 integrates the linear term exactly and
the nonlinear term to 4th order.  The phi-function coefficients are
evaluated on the host in f64 by the Kassam-Trefethen unit-circle contour
mean (numerically stable near z = 0) and cast once — the same
f64-tables-then-cast rule every trig table in this repo follows.

State is the SPLIT (re, im) half spectrum riding the batched R2C/C2R
kernels; the whole rollout is ONE jitted lax.scan program (plan-object
jit cache, like models/burgers.py).  The reference ships no models
(SURVEY §1); this extends the model family (FNO, Navier-Stokes, Burgers,
Poisson) with the standard exponential-integrator workload.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rfft import irfft_last_split, rfft_last_split

__all__ = ["KSPlan", "ks_init", "ks_step", "ks_rollout", "kt_initial_condition"]


class KSPlan:
    """Immutable ETDRK4 stepper config; compiled rollouts cached per
    (steps, keep_every) — build once, replay many."""

    def __init__(self, consts):
        self._consts = consts
        self._jit_cache = {}

    def __getitem__(self, key):
        return self._consts[key]


def _etdrk4_coeffs(lin: np.ndarray, h: float, m: int = 32):
    """Kassam-Trefethen contour coefficients for dt=h over the real linear
    symbol `lin` (f64): E, E2, Q, f1, f2, f3 — each shaped like lin."""
    z = h * lin[:, None].astype(np.float64)
    r = np.exp(1j * np.pi * (np.arange(1, m + 1) - 0.5) / m)[None, :]
    zr = z + r
    E = np.exp(h * lin)
    E2 = np.exp(0.5 * h * lin)
    Q = h * np.real(np.mean((np.expm1(zr / 2.0)) / zr, axis=1))
    f1 = h * np.real(np.mean(
        (-4.0 - zr + np.exp(zr) * (4.0 - 3.0 * zr + zr ** 2)) / zr ** 3, axis=1))
    f2 = h * np.real(np.mean(
        (2.0 + zr + np.exp(zr) * (-2.0 + zr)) / zr ** 3, axis=1))
    f3 = h * np.real(np.mean(
        (-4.0 - 3.0 * zr - zr ** 2 + np.exp(zr) * (4.0 - zr)) / zr ** 3, axis=1))
    return E, E2, Q, f1, f2, f3


def ks_init(n: int, length: float, dt: float) -> KSPlan:
    """Precompute wavenumbers, 2/3-rule dealias mask, and the six ETDRK4
    coefficient tables for an n-point grid on [0, length)."""
    k = (2.0 * np.pi / length) * np.fft.rfftfreq(n, 1.0 / n).astype(np.float64)
    lin = k * k - k ** 4
    E, E2, Q, f1, f2, f3 = _etdrk4_coeffs(lin, float(dt))
    mask = (np.fft.rfftfreq(n, 1.0 / n) <= n / 3.0).astype(np.float32)
    f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
    return KSPlan({
        "n": n, "dt": float(dt), "k": f32(k), "mask": f32(mask),
        "E": f32(E), "E2": f32(E2), "Q": f32(Q),
        "f1": f32(f1), "f2": f32(f2), "f3": f32(f3),
    })


def _nonlinear(c, vr, vi):
    """N(v)_hat = -(ik/2) (u^2)_hat from the split spectrum, dealiased."""
    n, k, m = c["n"], c["k"], c["mask"]
    u = irfft_last_split(vr, vi, n, 1.0 / n)
    ar, ai = rfft_last_split(u * u, None)
    return 0.5 * k * ai * m, -0.5 * k * ar * m


def ks_step(c, vr, vi):
    """One ETDRK4 step on the split half spectrum."""
    E, E2, Q, f1, f2, f3 = (c["E"], c["E2"], c["Q"],
                            c["f1"], c["f2"], c["f3"])
    nvr, nvi = _nonlinear(c, vr, vi)
    ar, ai = E2 * vr + Q * nvr, E2 * vi + Q * nvi
    nar, nai = _nonlinear(c, ar, ai)
    br, bi = E2 * vr + Q * nar, E2 * vi + Q * nai
    nbr, nbi = _nonlinear(c, br, bi)
    cr_, ci_ = E2 * ar + Q * (2.0 * nbr - nvr), E2 * ai + Q * (2.0 * nbi - nvi)
    ncr, nci = _nonlinear(c, cr_, ci_)
    vr2 = E * vr + f1 * nvr + 2.0 * f2 * (nar + nbr) + f3 * ncr
    vi2 = E * vi + f1 * nvi + 2.0 * f2 * (nai + nbi) + f3 * nci
    return vr2, vi2


def ks_rollout(c, u0, steps: int, keep_every: int = 0):
    """Integrate real u0 [..., n] for `steps` ETDRK4 steps inside one
    jitted lax.scan.  keep_every=0 returns only the final field [..., n];
    keep_every=s additionally returns the trajectory sampled every s
    steps, stacked on a new leading-time axis [steps//s, ..., n]."""
    if keep_every and steps % keep_every:
        raise ValueError("steps must be a multiple of keep_every")
    cache = c._jit_cache
    run = cache.get((steps, keep_every))
    if run is None:

        @jax.jit
        def run(u0):
            vr, vi = rfft_last_split(u0, None)
            m = c["mask"]
            vr, vi = vr * m, vi * m
            n, inv = c["n"], 1.0 / c["n"]
            if keep_every:
                def inner(carry, _):
                    return ks_step(c, *carry), None

                def chunk(carry, _):
                    carry, _ = jax.lax.scan(
                        inner, carry, None, length=keep_every)
                    return carry, irfft_last_split(*carry, n, inv)

                (vr, vi), traj = jax.lax.scan(
                    chunk, (vr, vi), None, length=steps // keep_every)
                return irfft_last_split(vr, vi, n, inv), traj
            def body(carry, _):
                return ks_step(c, *carry), None
            (vr, vi), _ = jax.lax.scan(body, (vr, vi), None, length=steps)
            return irfft_last_split(vr, vi, n, inv)

        cache[(steps, keep_every)] = run
    return run(u0)


def kt_initial_condition(n: int, length: float):
    """The Kassam-Trefethen demo initial condition on [0, length):
    u0 = cos(2 pi x / length) (1 + sin(2 pi x / length))."""
    x = np.arange(n, dtype=np.float64) * (length / n)
    th = 2.0 * np.pi * x / length
    return jnp.asarray((np.cos(th) * (1.0 + np.sin(th))).astype(np.float32))
