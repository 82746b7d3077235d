"""Chebyshev collocation boundary-value problem demo: solve

    u''(x) = f(x)  on [-1, 1],   u(-1) = u(1) = 0

with the differentiation operator built column-by-column from the
framework's DCT-path spectral derivative (ops/chebyshev.py), and verify
against a manufactured solution.  Also demonstrates Clenshaw-Curtis
quadrature on the result.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import fft_wgpu_tpu as ftt


def main():
    n = 48
    x = np.asarray(ftt.cheb_points(n), np.float64)

    # manufactured solution
    u_exact = (1 - x * x) * np.exp(x)
    # u = (1-x^2)e^x: u' = e^x(1 - x^2 - 2x), u'' = e^x(1 - x^2 - 4x - 2)
    f = np.exp(x) * (-x * x - 4 * x - 1)

    # second-derivative collocation operator from the batched spectral
    # derivative: D2 columns = cheb_derivative of the identity's columns
    eye = np.eye(n + 1, dtype=np.float32)
    D2 = np.asarray(ftt.cheb_derivative(eye.T, order=2), np.float64).T

    # impose Dirichlet BCs: replace first/last rows with identity
    A = D2.copy()
    rhs = f.copy()
    A[0, :] = 0.0
    A[0, 0] = 1.0
    A[-1, :] = 0.0
    A[-1, -1] = 1.0
    rhs[0] = rhs[-1] = 0.0

    u = np.linalg.solve(A, rhs)
    rel = np.linalg.norm(u - u_exact) / np.linalg.norm(u_exact)
    print(f"BVP u'' = f, Dirichlet, n = {n}: rel-L2 vs exact = {rel:.2e}")

    # Clenshaw-Curtis integral of the solution vs the closed form
    # int_{-1}^{1} (1-x^2) e^x dx = 4/e
    got = float(ftt.cheb_integrate(u.astype(np.float32)))
    want = 4.0 / np.e
    print(f"Clenshaw-Curtis integral: {got:.6f} (exact 4/e = {want:.6f}, "
          f"err {abs(got-want):.1e})")

    assert rel < 1e-3 and abs(got - want) < 1e-4


if __name__ == "__main__":
    main()
