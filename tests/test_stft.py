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


def test_stft_istft_torch_win_length_parity(rng):
    """torch.stft/istft drop-in semantics (round-3 parity fuzz):
    win_length < n_fft pads the window centered; istft(length=) serves
    the tail from the right-pad region's reconstructed samples (it
    never zero-fills samples the OLA actually covers)."""
    torch = pytest.importorskip("torch")

    x = rng.standard_normal(5000).astype(np.float32)
    for n_fft, hop, wl in ((512, 128, 400), (400, 100, 300)):
        w = np.hanning(wl).astype(np.float32)
        T = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop,
                       win_length=wl, window=torch.from_numpy(w),
                       center=True, return_complex=True).numpy()
        G = np.asarray(st.stft(x, n_fft=n_fft, hop_length=hop,
                               window=w, win_length=wl))
        assert np.linalg.norm(G - T) / np.linalg.norm(T) < 1e-4
        xr = torch.istft(torch.from_numpy(T), n_fft=n_fft,
                         hop_length=hop, win_length=wl,
                         window=torch.from_numpy(w), center=True,
                         length=5000).numpy()
        gr = np.asarray(st.istft(G, n_fft, hop, window=w,
                                 length=5000, win_length=wl))
        assert np.linalg.norm(gr - xr) / np.linalg.norm(xr) < 1e-4

    with pytest.raises(ValueError):
        st.stft(x, n_fft=256, window=np.ones(300, np.float32))
