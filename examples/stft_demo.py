"""STFT demo: chirp spectrogram + perfect-reconstruction check."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from fft_wgpu_tpu.ops.stft import istft, stft


def main():
    sr, dur = 16000, 2.0
    t = np.arange(int(sr * dur)) / sr
    sig = np.sin(2 * np.pi * (200 * t + 400 * t**2)).astype(np.float32)  # chirp

    Z = stft(sig, n_fft=512, hop_length=128)
    mag = np.abs(np.asarray(np.real(Z)) + 1j * np.asarray(np.imag(Z)))
    peak_bins = mag.argmax(axis=0)
    print(f"spectrogram {mag.shape}; peak bin drifts {peak_bins[2]} -> {peak_bins[-3]} (chirp)")

    y = np.asarray(istft(Z, n_fft=512, hop_length=128, length=len(sig)))
    err = np.linalg.norm(y - sig) / np.linalg.norm(sig)
    print(f"istft(stft(x)) rel-L2 = {err:.2e}")
    assert err < 1e-4


if __name__ == "__main__":
    main()
