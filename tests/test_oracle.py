"""Oracle self-consistency: naive DFT vs numpy.fft (SURVEY §7 build step 1)."""

import numpy as np
import pytest

from fft_wgpu_tpu.core.reference import naive_dft, naive_idft


@pytest.mark.parametrize("n", [1, 2, 4, 16, 128, 120, 243])
def test_naive_dft_matches_numpy(n, rng, assert_close):
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert_close(naive_dft(x), np.fft.fft(x), tol=1e-9)


@pytest.mark.parametrize("n", [4, 64, 100])
def test_naive_idft_matches_numpy(n, rng, assert_close):
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    assert_close(naive_idft(x), np.fft.ifft(x), tol=1e-9)
    assert_close(naive_idft(x, normalize=False), np.fft.ifft(x) * n, tol=1e-9)


def test_naive_dft_batched_axis(rng, assert_close):
    x = rng.standard_normal((3, 8, 5)) + 1j * rng.standard_normal((3, 8, 5))
    assert_close(naive_dft(x, axis=1), np.fft.fft(x, axis=1), tol=1e-9)
