"""Spectral Poisson solver vs analytic solutions."""

import numpy as np

from fft_wgpu_tpu.models.poisson import solve_poisson, solve_poisson_distributed
from fft_wgpu_tpu.parallel.mesh import make_pencil_mesh


def _analytic_case_2d(n=64):
    # u = sin(x)cos(2y) -> laplacian u = -(1+4) u
    x = np.linspace(0, 2 * np.pi, n, endpoint=False)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = np.sin(X) * np.cos(2 * Y)
    f = -5.0 * u
    return f.astype(np.float32), u


def test_poisson_2d_analytic():
    f, u = _analytic_case_2d()
    got = np.asarray(solve_poisson(f))
    err = np.linalg.norm(got - u) / np.linalg.norm(u)
    assert err < 1e-4, f"rel err {err:.2e}"


def test_poisson_3d_roundtrip():
    rng = np.random.default_rng(0)
    n = 32
    u = rng.standard_normal((n, n, n)).astype(np.float32)
    u -= u.mean()
    # build f = laplacian(u) spectrally, then solve back
    ku = np.fft.fftfreq(n) * n
    KX, KY, KZ = np.meshgrid(ku, ku, ku, indexing="ij")
    ksq = KX**2 + KY**2 + KZ**2
    F = -ksq * np.fft.fftn(u)
    f = np.real(np.fft.ifftn(F)).astype(np.float32)
    got = np.asarray(solve_poisson(f, lengths=(2 * np.pi,) * 3))
    err = np.linalg.norm(got - u) / np.linalg.norm(u)
    assert err < 1e-3, f"rel err {err:.2e}"


def test_poisson_distributed_matches_local():
    f, u = _analytic_case_2d(32)
    f3 = np.broadcast_to(f[None, :, :], (16, 32, 32)).astype(np.float32).copy()
    # 3D: u3 = sin(y)cos(2z) constant along x; laplacian still -5u
    mesh = make_pencil_mesh()
    got = np.asarray(solve_poisson_distributed(f3, mesh))
    want = np.asarray(solve_poisson(f3))
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    assert err < 1e-4, f"dist-vs-local rel err {err:.2e}"
