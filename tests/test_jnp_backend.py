"""jnp.fft acceleration patch (fft_wgpu_tpu.jnp_backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fft_wgpu_tpu.jnp_backend as jb


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_install_uninstall_roundtrip():
    stock = jnp.fft.fft
    jb.install()
    assert jnp.fft.fft is not stock
    assert getattr(jnp.fft.fft, "__wrapped_by_fft_wgpu_tpu__", False)
    jb.install()  # nested: refcounted
    jb.uninstall()
    assert getattr(jnp.fft.fft, "__wrapped_by_fft_wgpu_tpu__", False)
    jb.uninstall()
    assert jnp.fft.fft is stock
    jb.uninstall()  # over-release is a no-op
    assert jnp.fft.fft is stock


def test_nested_accelerated_keeps_outer_install():
    stock = jnp.fft.fft
    jb.install()
    with jb.accelerated():
        pass
    # the inner scope must NOT strip the outer global install
    assert getattr(jnp.fft.fft, "__wrapped_by_fft_wgpu_tpu__", False)
    jb.uninstall()
    assert jnp.fft.fft is stock


def test_accelerated_matches_numpy(rng):
    x = (rng.standard_normal((4, 256))
         + 1j * rng.standard_normal((4, 256))).astype(np.complex64)
    with jb.accelerated():
        X = np.asarray(jnp.fft.fft(x))
        Y = np.asarray(jnp.fft.ifft(X))
    want = np.fft.fft(x)
    assert np.linalg.norm(X - want) / np.linalg.norm(want) < 1e-5
    assert np.linalg.norm(Y - x) / np.linalg.norm(x) < 1e-5


def test_accelerated_real_family(rng):
    x = rng.standard_normal((3, 128)).astype(np.float32)
    with jb.accelerated():
        X = np.asarray(jnp.fft.rfft(x))
        y = np.asarray(jnp.fft.irfft(X, n=128))
        X2 = np.asarray(jnp.fft.rfft2(rng.standard_normal(
            (16, 32)).astype(np.float32)))
    assert np.linalg.norm(X - np.fft.rfft(x)) / np.linalg.norm(
        np.fft.rfft(x)) < 1e-5
    assert np.linalg.norm(y - x) / np.linalg.norm(x) < 1e-5
    assert X2.shape == (16, 17)


def test_accelerated_inside_jit_and_grad(rng):
    x = rng.standard_normal((2, 64)).astype(np.float32)
    with jb.accelerated():
        @jax.jit
        def f(v):
            return jnp.sum(jnp.abs(jnp.fft.rfft(v)) ** 2)

        val = float(f(x))
        g = np.asarray(jax.grad(f)(x))
    # Parseval: sum|rfft|^2 over the half spectrum ~ n/2 * sum x^2-ish;
    # just check against the stock result instead
    want = float(np.sum(np.abs(np.fft.rfft(x)) ** 2))
    assert abs(val - want) / abs(want) < 1e-5
    # gradient of sum|X|^2 wrt x: 2*n_effective*x pattern — verify against
    # numerical stock-jnp gradient
    g_ref = np.asarray(jax.grad(
        lambda v: jnp.sum(jnp.abs(jnp.fft.rfft(v)) ** 2))(x))
    assert np.linalg.norm(g - g_ref) / np.linalg.norm(g_ref) < 1e-4


def test_fallback_on_unsupported_signature(rng):
    x = rng.standard_normal(32).astype(np.float32)
    with jb.accelerated():
        # norm= IS supported; this must still work
        X = np.asarray(jnp.fft.fft(x, norm="ortho"))
    want = np.fft.fft(x, norm="ortho")
    assert np.linalg.norm(X - want) / np.linalg.norm(want) < 1e-5


def test_exception_safety():
    stock = jnp.fft.fft
    with pytest.raises(RuntimeError):
        with jb.accelerated():
            raise RuntimeError("boom")
    assert jnp.fft.fft is stock
