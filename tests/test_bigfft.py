"""Single-pass whole-row-in-VMEM large-N kernel (ops/bigfft.py).

Runs the Pallas kernel in interpret mode on CPU (the TPU fast path is
exercised by scripts/probe_bigfft.py and the `-m tpu` tier).  Oracle:
numpy.fft.  Reference behavior being re-realized: processor.rs streams
radix-2 stages through HBM for any length; this kernel does the whole row
in one round trip.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from fft_wgpu_tpu.ops import bigfft


def _run(x, sign, scale=None):
    rr, ri = bigfft.fft_big_split(
        jnp.asarray(x.real.astype(np.float32)),
        jnp.asarray(x.imag.astype(np.float32)),
        sign, scale, interpret=True)
    return np.asarray(rr) + 1j * np.asarray(ri)


@pytest.mark.parametrize("n", [1 << 15, 1 << 16, 1 << 17])
def test_forward_vs_numpy(n, rng, assert_close):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    assert_close(_run(x, -1), np.fft.fft(x, axis=-1), what=f"bigfft n={n}")


def test_inverse_scale_fold(rng, assert_close):
    n = 1 << 15
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    X = _run(x, -1)
    back = _run(X, +1, 1.0 / n)
    assert_close(back, x, what="bigfft roundtrip with folded 1/N")


def test_single_row_and_high_rank(rng, assert_close):
    n = 1 << 15
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    assert_close(_run(x, -1), np.fft.fft(x), what="bigfft 1-D input")
    x3 = (rng.standard_normal((2, 2, n)) + 1j * rng.standard_normal((2, 2, n))
          ).astype(np.complex64)
    assert_close(_run(x3, -1), np.fft.fft(x3, axis=-1), what="bigfft rank-3")


def test_envelope_rejection():
    r = jnp.zeros((1, 1 << 14), jnp.float32)
    with pytest.raises(bigfft.Unsupported):
        bigfft.fft_big_split(r, r, -1)
    r = jnp.zeros((1, 3 * (1 << 14)), jnp.float32)  # non power of two
    with pytest.raises(bigfft.Unsupported):
        bigfft.fft_big_split(r, r, -1)
    # batched rows above the measured crossover lose to the four-step
    # (probe_r72) and 2^21 multi-row OOMs VMEM: must raise
    r = jnp.zeros((2, 1 << 17), jnp.float32)
    with pytest.raises(bigfft.Unsupported):
        bigfft.fft_big_split(r, r, -1)


def test_tw_form_parity(rng, assert_close, monkeypatch):
    # factored outer twiddle (production, probe_r40: 1.3x on hardware)
    # must agree with the direct [S, 128] table bit-for-tolerance
    n = 1 << 15
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    monkeypatch.setattr(bigfft, "TW_FORM", "factored")
    a = _run(x, -1)
    monkeypatch.setattr(bigfft, "TW_FORM", "direct")
    b = _run(x, -1)
    assert_close(a, np.fft.fft(x), what="bigfft factored tw")
    assert_close(a, b, what="bigfft factored vs direct tw")


def test_impulse_natural_order():
    # delta at position p -> X[k] = exp(-2pi i k p / n): catches any output
    # reordering mistakes that a random roundtrip would mask.
    n = 1 << 15
    p = 12345
    x = np.zeros(n, np.complex64)
    x[p] = 1.0
    X = _run(x, -1)
    k = np.arange(n)
    want = np.exp(-2j * np.pi * k * p / n)
    err = np.linalg.norm(X - want) / np.linalg.norm(want)
    assert err < 1e-5
