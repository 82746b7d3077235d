"""1-D C2C transform correctness vs numpy.fft and the naive DFT oracle.

Mirrors (and strengthens: forward asserts too, unlike the reference's
print-only test_fft — fft_wgpu examples/basic.rs:250) the reference's oracle
strategy of examples/basic_inverse.rs:217-253.
"""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu.core.reference import naive_dft

POW2 = [2, 4, 8, 16, 64, 256, 512, 1024, 4096]
NONPOW2 = [3, 6, 12, 100, 120, 360, 1000, 1536]
PRIMES = [7, 31, 97, 251]


def crand(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


@pytest.mark.parametrize("n", POW2 + NONPOW2 + PRIMES)
def test_forward_matches_numpy(n, rng, assert_close):
    x = crand(rng, n)
    assert_close(ftt.fft(x), np.fft.fft(x), what=f"(n={n})")


@pytest.mark.parametrize("n", [16, 512, 1024, 120, 97])
def test_forward_matches_naive_dft(n, rng, assert_close):
    x = crand(rng, n)
    assert_close(ftt.fft(x), naive_dft(x), what=f"(n={n})")


@pytest.mark.parametrize("n", POW2 + [120, 97])
def test_inverse_matches_numpy(n, rng, assert_close):
    x = crand(rng, n)
    assert_close(ftt.ifft(x), np.fft.ifft(x), what=f"(n={n})")


@pytest.mark.parametrize("n", [512, 1024, 120])
def test_roundtrip(n, rng, assert_close):
    x = crand(rng, 3, n)
    assert_close(ftt.ifft(ftt.fft(x)), x, what=f"(n={n})")


def test_batched_rows_match_reference_shape(rng, assert_close):
    # The reference's bench shape: 2500 rows x 512 points
    # (examples/basic.rs:32,66).
    x = crand(rng, 100, 512)  # trimmed batch for test speed
    assert_close(ftt.fft(x), np.fft.fft(x, axis=-1))


def test_axis_argument(rng, assert_close):
    x = crand(rng, 4, 64, 3)
    assert_close(ftt.fft(x, axis=1), np.fft.fft(x, axis=1))
    assert_close(ftt.ifft(x, axis=0), np.fft.ifft(x, axis=0))


def test_n_pad_and_trim(rng, assert_close):
    x = crand(rng, 100)
    assert_close(ftt.fft(x, n=128), np.fft.fft(x, n=128))
    assert_close(ftt.fft(x, n=64), np.fft.fft(x, n=64))


@pytest.mark.parametrize("norm", [None, "backward", "ortho", "forward"])
def test_norm_modes(norm, rng, assert_close):
    x = crand(rng, 256)
    nm = None if norm is None else norm
    assert_close(ftt.fft(x, norm=nm), np.fft.fft(x, norm=nm or "backward"))
    assert_close(ftt.ifft(x, norm=nm), np.fft.ifft(x, norm=nm or "backward"))


def test_unnormalized_inverse_plus_normalize(rng, assert_close):
    # Two-pass flow of the reference (examples/basic_inverse2.rs:85-92).
    x = crand(rng, 512)
    y = ftt.normalize(ftt.ifft_unnormalized(x))
    assert_close(y, np.fft.ifft(x))


def test_impulse_and_linearity(rng, assert_close):
    n = 256
    e = np.zeros(n, np.complex64)
    e[0] = 1.0
    assert_close(ftt.fft(e), np.ones(n))  # delta -> flat spectrum
    x, y = crand(rng, n), crand(rng, n)
    assert_close(
        ftt.fft(2.0 * x + 3.0 * y),
        2.0 * np.asarray(ftt.fft(x)) + 3.0 * np.asarray(ftt.fft(y)),
    )


def test_parseval(rng):
    n = 1024
    x = crand(rng, n)
    X = np.asarray(ftt.fft(x))
    lhs = np.sum(np.abs(x) ** 2)
    rhs = np.sum(np.abs(X) ** 2) / n
    assert abs(lhs - rhs) / lhs < 1e-5


def test_real_input_promoted(rng, assert_close):
    x = rng.standard_normal(128).astype(np.float32)
    assert_close(ftt.fft(x), np.fft.fft(x))


def test_jit_and_grad():
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: jnp.sum(jnp.abs(ftt.fft(x)) ** 2))
    x = jnp.arange(64, dtype=jnp.float32)
    v = f(x)
    g = jax.grad(f)(x)
    # Parseval: sum|X|^2 = n*sum|x|^2 for real x -> grad = 2*n*x
    np.testing.assert_allclose(np.asarray(v), 64 * np.sum(np.arange(64.0) ** 2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g), 2 * 64 * np.arange(64.0), rtol=1e-4, atol=1e-2
    )


def test_empty_batch(rng):
    x = np.zeros((0, 256), np.complex64)
    out = np.asarray(ftt.fft(x))
    assert out.shape == (0, 256)
