"""Split-step NLSE/GPE integrator vs analytic solutions.

Oracles: the exact bright soliton of the focusing NLSE, exact free
(g = 0) Gaussian dispersion, and the invariants (mass exactly conserved
by both substeps up to roundoff; Hamiltonian approximately conserved)."""

import numpy as np
import pytest

from fft_wgpu_tpu.models import (
    bright_soliton,
    free_gaussian,
    nlse_init,
    nlse_rollout,
    nlse_step,
)


def _merge(pair):
    return np.asarray(pair[0], np.float64) + 1j * np.asarray(pair[1], np.float64)


class TestSoliton:
    def test_standing_soliton_phase(self):
        # v=0 soliton: |psi| static, global phase exp(i eta^2 t / 2)
        n, L, dt, steps = 256, 40.0, 1e-3, 1000
        c = nlse_init((n,), L, dt, g=1.0)
        psi0 = bright_soliton(n, L, eta=1.0)
        got = _merge(nlse_rollout(c, psi0, steps))
        want = _merge(bright_soliton(n, L, eta=1.0, t=steps * dt))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 2e-4, rel

    def test_moving_soliton(self):
        n, L, dt, steps = 512, 80.0, 5e-4, 4000
        c = nlse_init((n,), L, dt, g=1.0)
        psi0 = bright_soliton(n, L, eta=1.2, v=1.5)
        got = _merge(nlse_rollout(c, psi0, steps))
        want = _merge(bright_soliton(n, L, eta=1.2, v=1.5, t=steps * dt))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-3, rel

    def test_dt_convergence_second_order(self):
        # dt large enough that the Strang O(dt^2) error dominates the
        # f32 roundoff floor (~1e-5 relative)
        n, L, T = 256, 40.0, 4.0
        psi0 = bright_soliton(n, L, eta=1.5, v=0.8)
        want = _merge(bright_soliton(n, L, eta=1.5, v=0.8, t=T))
        errs = []
        for steps in (20, 40, 80):
            c = nlse_init((n,), L, T / steps, g=1.0)
            got = _merge(nlse_rollout(c, psi0, steps))
            errs.append(np.linalg.norm(got - want) / np.linalg.norm(want))
        # halving dt should cut the error ~4x (Strang is O(dt^2))
        assert errs[0] / errs[1] > 3.0, errs
        assert errs[1] / errs[2] > 3.0, errs


class TestInvariants:
    def test_mass_conserved(self):
        n, L, dt = 256, 30.0, 2e-3
        c = nlse_init((n,), L, dt, g=-1.0)  # defocusing
        rng = np.random.default_rng(0)
        re = rng.standard_normal(n).astype(np.float32) * 0.3
        im = rng.standard_normal(n).astype(np.float32) * 0.3
        psi = _merge(nlse_rollout(c, (re, im), 500))
        m0 = np.sum(np.abs(re.astype(np.float64) + 1j * im) ** 2)
        m1 = np.sum(np.abs(psi) ** 2)
        # both substeps conserve mass exactly; drift is f32 accumulation
        assert abs(m1 - m0) / m0 < 2e-4

    def test_trajectory_sampling(self):
        n, L, dt = 128, 20.0, 1e-3
        c = nlse_init((n,), L, dt, g=1.0)
        psi0 = bright_soliton(n, L)
        (fr, fi), (tr, ti) = nlse_rollout(c, psi0, 100, keep_every=25)
        assert tr.shape == (4, n) and ti.shape == (4, n)
        np.testing.assert_allclose(np.asarray(tr[-1]), np.asarray(fr))
        # step-by-step equals the scanned rollout
        ur, ui = psi0
        for _ in range(25):
            ur, ui = nlse_step(c, ur, ui)
        # scan-of-scan vs eager loop: same math, different fusion order,
        # f32 roundoff differs
        np.testing.assert_allclose(np.asarray(ur), np.asarray(tr[0]),
                                   rtol=1e-3, atol=1e-5)


class TestLinearLimit:
    def test_free_gaussian_1d(self):
        n, L, dt, steps = 512, 60.0, 2e-3, 500
        x = (np.arange(n) - n / 2) * (L / n)
        c = nlse_init((n,), L, dt, g=0.0)
        psi0 = free_gaussian([x], sigma=2.0)
        got = _merge(nlse_rollout(c, psi0, steps))
        want = _merge(free_gaussian([x], sigma=2.0, t=steps * dt))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        # linear case: split-step is EXACT in time; f32 roundoff
        # accumulates over 500 transform pairs
        assert rel < 1e-4, rel

    def test_free_gaussian_2d(self):
        n, L, dt, steps = 64, 30.0, 5e-3, 100
        x = (np.arange(n) - n / 2) * (L / n)
        c = nlse_init((n, n), L, dt, g=0.0)
        psi0 = free_gaussian([x, x], sigma=2.5)
        got = _merge(nlse_rollout(c, psi0, steps))
        want = _merge(free_gaussian([x, x], sigma=2.5, t=steps * dt))
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 1e-4, rel


class TestGPE:
    def test_harmonic_trap_coherent_state(self):
        # linear Schrodinger + harmonic trap V = x^2/2: the ground state
        # psi = exp(-x^2/2) is stationary up to phase exp(-i t / 2)
        n, L, dt, steps = 256, 30.0, 1e-3, 1000
        x = (np.arange(n) - n / 2) * (L / n)
        V = 0.5 * x * x
        c = nlse_init((n,), L, dt, g=0.0, potential=V.astype(np.float32))
        psi0 = (np.exp(-x * x / 2).astype(np.float32),
                np.zeros(n, np.float32))
        got = _merge(nlse_rollout(c, psi0, steps))
        t = steps * dt
        want = np.exp(-x * x / 2) * np.exp(-1j * 0.5 * t)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert rel < 5e-4, rel

    def test_batched_leading_dims(self):
        n, L, dt = 128, 20.0, 1e-3
        c = nlse_init((n,), L, dt, g=1.0)
        s1 = bright_soliton(n, L, eta=1.0)
        s2 = bright_soliton(n, L, eta=0.7, v=0.5)
        batch = (np.stack([np.asarray(s1[0]), np.asarray(s2[0])]),
                 np.stack([np.asarray(s1[1]), np.asarray(s2[1])]))
        br, bi = nlse_rollout(c, batch, 50)
        r1, i1 = nlse_rollout(c, s1, 50)
        np.testing.assert_allclose(np.asarray(br[0]), np.asarray(r1),
                                   rtol=2e-5, atol=2e-6)
