"""MDCT/IMDCT vs the direct cosine-sum oracle + TDAC reconstruction."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def _direct_mdct(x):
    n2 = x.shape[-1]
    N = n2 // 2
    t = np.arange(n2)[None, :]
    k = np.arange(N)[:, None]
    M = np.cos(np.pi / N * (t + 0.5 + N / 2) * (k + 0.5))
    return x.astype(np.float64) @ M.T


def _direct_imdct(X):
    N = X.shape[-1]
    t = np.arange(2 * N)[:, None]
    k = np.arange(N)[None, :]
    M = np.cos(np.pi / N * (t + 0.5 + N / 2) * (k + 0.5))
    return (1.0 / N) * X.astype(np.float64) @ M.T


@pytest.mark.parametrize("N", [8, 32, 128])
def test_mdct_frame_oracle(N, rng):
    x = rng.standard_normal((3, 2 * N)).astype(np.float32)
    got = np.asarray(ftt.mdct_frame(x))
    want = _direct_mdct(x)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


@pytest.mark.parametrize("N", [8, 32, 128])
def test_imdct_frame_oracle(N, rng):
    X = rng.standard_normal((3, N)).astype(np.float32)
    got = np.asarray(ftt.imdct_frame(X))
    want = _direct_imdct(X)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-5


@pytest.mark.parametrize("N", [16, 64])
def test_tdac_perfect_reconstruction(N, rng):
    """sine-window MDCT -> IMDCT reconstructs interior samples exactly."""
    T = 8 * N
    x = rng.standard_normal((2, T)).astype(np.float32)
    y = np.asarray(ftt.imdct(ftt.mdct(x, N)))
    assert y.shape == (2, T)
    rel = (np.linalg.norm(y[:, N:-N] - x[:, N:-N])
           / np.linalg.norm(x[:, N:-N]))
    assert rel < 1e-5, rel


def test_mdct_validation():
    with pytest.raises(ValueError):
        ftt.mdct_frame(np.zeros(10, np.float32))  # not a multiple of 4
    with pytest.raises(ValueError):
        ftt.mdct(np.zeros(100, np.float32), 16)  # length not multiple of N
