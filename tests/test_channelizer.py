"""Polyphase (WOLA) channelizer tests.

Oracles: (1) a complex tone at channel k's center frequency lands in
channel k with near-unit magnitude and leaks below the prototype's
stopband into other channels; (2) each channel's response to an impulse
is the modulated prototype polyphase sum (direct WOLA reference);
(3) the whole path matches a direct numpy WOLA implementation on random
input.
"""

import numpy as np
import pytest

from fft_wgpu_tpu.ops.channelizer import channelize, prototype_lowpass


def _wola_ref(x, h, n_ch):
    """Direct numpy WOLA reference: frame, window, fold, DFT."""
    t = len(h)
    frames = len(x) // n_ch - t // n_ch + 1
    out = np.zeros((frames, n_ch), np.complex128)
    for m in range(frames):
        seg = x[m * n_ch : m * n_ch + t] * h
        folded = seg.reshape(t // n_ch, n_ch).sum(0)
        out[m] = np.fft.fft(folded)
    return out


@pytest.mark.parametrize("n_ch", [8, 16])
def test_matches_direct_wola(n_ch):
    rng = np.random.default_rng(0)
    x = (rng.standard_normal(64 * n_ch) + 1j * rng.standard_normal(64 * n_ch)).astype(
        np.complex64
    )
    h = np.asarray(prototype_lowpass(n_ch, taps=4), np.float64)
    ref = _wola_ref(np.asarray(x, np.complex128), h, n_ch)
    got = np.asarray(channelize(x, n_ch, taps=4))
    assert got.shape == ref.shape
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 1e-5


def test_tone_lands_in_its_channel():
    n_ch, taps = 16, 8
    n = 256 * n_ch
    k = 5
    t = np.arange(n)
    x = np.exp(2j * np.pi * (k / n_ch) * t).astype(np.complex64)
    y = np.asarray(channelize(x, n_ch, taps=taps))
    # drop edge frames (filter transient)
    y = y[taps : -taps or None]
    mag = np.abs(y).mean(0)
    assert mag[k] > 0.99  # unit DC gain per channel
    others = np.delete(mag, k)
    assert others.max() < 1e-3  # Hamming-sinc stopband


def test_real_input_and_batch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 32 * 8)).astype(np.float32)
    y = np.asarray(channelize(x, 8, taps=4))
    assert y.shape == (3, 32 - 4 + 1, 8)
    ref = np.stack(
        [
            _wola_ref(
                np.asarray(row, np.float64),
                np.asarray(prototype_lowpass(8, taps=4), np.float64),
                8,
            )
            for row in x
        ]
    )
    err = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert err < 1e-5


def test_custom_prototype_and_errors():
    x = np.zeros(64, np.float32)
    h = np.ones(32, np.float32) / 32
    y = np.asarray(channelize(x, 8, proto=h))
    assert y.shape == (64 // 8 - 4 + 1, 8)
    with pytest.raises(ValueError):
        channelize(x, 8, proto=np.ones(30))  # not a multiple of n_ch
    with pytest.raises(ValueError):
        channelize(np.zeros(16, np.float32), 8, taps=8)  # too short
    with pytest.raises(ValueError):
        prototype_lowpass(8, window="nope")
