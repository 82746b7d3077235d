"""STFT / ISTFT round-trip and reference checks."""

import numpy as np
import pytest

from fft_wgpu_tpu.ops import stft as st


def test_hann_matches_numpy():
    np.testing.assert_allclose(
        np.asarray(st.hann_window(64)), np.hanning(65)[:-1], atol=1e-6
    )


def test_stft_shape_and_content(rng, assert_close):
    x = rng.standard_normal(2048).astype(np.float32)
    Z = st.stft(x, n_fft=256, hop_length=64)
    assert Z.shape[0] == 129  # bins
    # DC bin of each frame = sum(frame * window)
    Z0 = np.asarray(np.real(Z[0, 4]))
    xp = np.pad(x, (128, 128), mode="reflect")
    w = np.asarray(st.hann_window(256))
    frame = xp[4 * 64 : 4 * 64 + 256] * w
    np.testing.assert_allclose(Z0, frame.sum(), rtol=1e-4)


def test_stft_istft_roundtrip(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    Z = st.stft(x, n_fft=512, hop_length=128)
    y = np.asarray(st.istft(Z, n_fft=512, hop_length=128, length=4096))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-4, f"roundtrip err {err:.2e}"


def test_stft_batched(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    Z = st.stft(x, n_fft=256)
    assert Z.shape[:1] == (3,)
    y = np.asarray(st.istft(Z, n_fft=256, length=2048))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-4

def test_stft_too_short_raises():
    with pytest.raises(ValueError, match="shorter than n_fft"):
        st.stft(np.zeros(100, np.float32), n_fft=256, center=False)
