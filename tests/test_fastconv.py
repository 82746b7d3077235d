"""Fused spectral filtering (ops/fastconv.py + pallas fft_filtered_split)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu.ops import pallas_fft as pf


def crand(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


@pytest.mark.parametrize("n", [512, 4096])  # balanced + balanced pins
def test_filtered_kernel_interpret_matches_composed(rng, n):
    x = crand(rng, 16, n)
    h = crand(rng, n)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    hr = np.ascontiguousarray(h.real, np.float32)
    hi = np.ascontiguousarray(h.imag, np.float32)
    gr, gi = pf.fft_filtered_split(re, im, hr, hi, -1, None,
                                   interpret=True)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    want = np.fft.fft(x * h, axis=-1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-5, rel


def test_filtered_kernel_classic_schedule(rng):
    # n without a balanced pin rides the classic kernel wrapper
    n = 256
    if n in pf._BALANCED:
        pytest.skip("256 gained a balanced pin; classic covered elsewhere")
    x = crand(rng, 8, n)
    h = crand(rng, n)
    gr, gi = pf.fft_filtered_split(
        np.ascontiguousarray(x.real, np.float32),
        np.ascontiguousarray(x.imag, np.float32),
        h.real.astype(np.float32), h.imag.astype(np.float32), -1, None,
        interpret=True)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    want = np.fft.fft(x * h, axis=-1)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_filtered_grad_adjoint(rng):
    """grad through the filtered op matches the composed reference (the
    conj(H) output-multiply adjoint)."""
    n = 512
    x = crand(rng, 4, n)
    h = crand(rng, n)
    re = jnp.asarray(x.real)
    im = jnp.asarray(x.imag)
    hr = jnp.asarray(h.real.astype(np.float32))
    hi = jnp.asarray(h.imag.astype(np.float32))

    def loss_fused(a, b):
        yr, yi = pf.fft_filtered_split(a, b, hr, hi, -1, 1.0 / n,
                                       interpret=True)
        return jnp.sum(yr**2 + 0.5 * yi**2)

    def loss_ref(a, b):
        cr = a * hr - b * hi
        ci = a * hi + b * hr
        z = jnp.fft.fft(jax.lax.complex(cr, ci)) / n
        return jnp.sum(jnp.real(z)**2 + 0.5 * jnp.imag(z)**2)

    ga = jax.grad(loss_fused, argnums=(0, 1))(re, im)
    gb = jax.grad(loss_ref, argnums=(0, 1))(re, im)
    for u, v in zip(ga, gb):
        rel = float(jnp.linalg.norm(u - v) / jnp.linalg.norm(v))
        assert rel < 1e-5, rel


def test_spectral_filter_plan(rng):
    n = 1024
    x = crand(rng, 8, n)
    H = crand(rng, n)
    f = ftt.SpectralFilter(H)
    got = np.asarray(ftt.device_get_complex(f.apply(x)))
    want = np.fft.ifft(np.fft.fft(x, axis=-1) * H, axis=-1)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5
    # time-domain construction = circular convolution with h
    h = crand(rng, n)
    g = ftt.SpectralFilter(h, domain="time")
    got = np.asarray(ftt.device_get_complex(g(x)))
    want = np.fft.ifft(np.fft.fft(x, axis=-1) * np.fft.fft(h), axis=-1)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_spectral_filter_validation(rng):
    with pytest.raises(ValueError):
        ftt.SpectralFilter(np.ones((2, 8)))
    with pytest.raises(ValueError):
        ftt.SpectralFilter(np.ones(8), n=16)
    with pytest.raises(ValueError):
        ftt.SpectralFilter(np.ones(8), domain="bogus")
    f = ftt.SpectralFilter(np.ones(8, np.complex64))
    with pytest.raises(ValueError):
        f.apply(np.zeros((2, 16), np.complex64))


def test_spectral_filter_identity_and_delay(rng):
    n = 256
    x = crand(rng, 3, n)
    ident = ftt.SpectralFilter(np.ones(n, np.complex64))
    got = np.asarray(ftt.device_get_complex(ident(x)))
    assert np.linalg.norm(got - x) / np.linalg.norm(x) < 1e-5
    # unit-delay impulse response shifts circularly by one
    h = np.zeros(n, np.complex64)
    h[1] = 1.0
    d = ftt.SpectralFilter(h, domain="time")
    got = np.asarray(ftt.device_get_complex(d(x)))
    assert np.linalg.norm(got - np.roll(x, 1, -1)) / np.linalg.norm(x) < 1e-5


def test_bank_kernel_interpret(rng):
    """Filter-bank kernel: y[s] = FFT(x * h[s]) with broadcast signal."""
    n, S = 512, 12
    x = crand(rng, n)
    h = crand(rng, S, n)
    gr, gi = pf.fft_bank_split(
        np.ascontiguousarray(x.real, np.float32),
        np.ascontiguousarray(x.imag, np.float32),
        h.real.astype(np.float32), h.imag.astype(np.float32), -1, None,
        interpret=True)
    got = np.asarray(gr) + 1j * np.asarray(gi)
    want = np.fft.fft(x[None, :] * h, axis=-1)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


def test_bank_grad_adjoint(rng):
    """grad wrt the signal through the bank kernel matches the composed
    reference (the sum-over-scales conj(h) adjoint)."""
    n, S = 512, 4
    x = crand(rng, n)
    h = crand(rng, S, n)
    hr = jnp.asarray(h.real.astype(np.float32))
    hi = jnp.asarray(h.imag.astype(np.float32))
    re = jnp.asarray(x.real)
    im = jnp.asarray(x.imag)

    def loss_fused(a, b):
        yr, yi = pf.fft_bank_split(a, b, hr, hi, +1, 1.0 / n,
                                   interpret=True)
        return jnp.sum(yr**2 + 2.0 * yi**2)

    def loss_ref(a, b):
        z = jnp.fft.ifft(jax.lax.complex(a * hr - b * hi,
                                         a * hi + b * hr), axis=-1)
        return jnp.sum(jnp.real(z)**2 + 2.0 * jnp.imag(z)**2)

    ga = jax.grad(loss_fused, argnums=(0, 1))(re, im)
    gb = jax.grad(loss_ref, argnums=(0, 1))(re, im)
    for u, v in zip(ga, gb):
        rel = float(jnp.linalg.norm(u - v) / jnp.linalg.norm(v))
        assert rel < 1e-5, rel


def test_cwt_plan_matches_oneshot(rng):
    """The CWT plan (fused-bank path off-TPU falls back to the composed
    ops) must agree with the one-shot cwt and stay differentiable."""
    n = 400
    x = rng.standard_normal(n).astype(np.float32)
    widths = np.arange(1, 11)
    want = np.asarray(ftt.cwt(x, widths))
    p = ftt.CWT(n, widths)
    got = np.asarray(p(x))
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 1e-4, rel
    # complex wavelet path
    wantc = np.asarray(ftt.device_get_complex(ftt.cwt(x, widths,
                                                      "morlet2", w=6.0)))
    pc = ftt.CWT(n, widths, "morlet2", w=6.0)
    gotc = np.asarray(ftt.device_get_complex(pc(x)))
    assert np.linalg.norm(gotc - wantc) / np.linalg.norm(wantc) < 1e-4
    with pytest.raises(ValueError):
        p.apply(np.zeros(n + 1, np.float32))
    # differentiable wrt the signal
    g = jax.grad(lambda s: jnp.sum(p._jit(s, p._Br, p._Bi)[0] ** 2))(
        jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
