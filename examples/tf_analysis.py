"""Time-frequency analysis tour: one chirp signal analyzed four ways —
ShortTimeFFT (linear, sliding window), Wigner-Ville (quadratic, sharpest
ridge), CWT (multi-scale), and Thomson multitaper (stationary PSD) —
each a single batched program on the fused kernels.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import fft_wgpu_tpu as ftt


def main():
    fs, n = 1000.0, 2048
    t = np.arange(n) / fs
    f0, f1 = 50.0, 350.0
    finst = f0 + (f1 - f0) * t / t[-1]  # linear chirp 50 -> 350 Hz
    phase = 2 * np.pi * np.cumsum(finst) / fs
    x = np.sin(phase).astype(np.float32)

    # 1. sliding-window STFT (scipy ShortTimeFFT API)
    win = np.asarray(ftt.hann_window(128))
    st = ftt.ShortTimeFFT(win, hop=32, fs=fs, scale_to="magnitude")
    S = np.abs(np.asarray(ftt.device_get_complex(st.stft(x))))
    tt = st.t(n)
    ridge_err = []
    for p in range(len(tt)):
        if 0.15 <= tt[p] <= 1.85:
            ridge_err.append(abs(st.f[np.argmax(S[:, p])]
                                 - np.interp(tt[p], t, finst)))
    print(f"ShortTimeFFT ridge: mean |f_est - f_inst| = "
          f"{np.mean(ridge_err):.1f} Hz (resolution {st.delta_f:.1f} Hz)")

    # 2. Wigner-Ville on the analytic signal (quadratic: sharper ridge)
    xa = ftt.device_get_complex(ftt.hilbert(x))
    fw, W = ftt.wigner_ville(np.asarray(xa, np.complex64), fs=fs)
    W = np.asarray(W)
    werr = [abs(fw[np.argmax(W[i])] - finst[i])
            for i in range(n // 8, 7 * n // 8, 64)]
    print(f"Wigner-Ville ridge:  mean |f_est - f_inst| = "
          f"{np.mean(werr):.1f} Hz (grid {fs / (2 * n):.2f} Hz)")

    # 3. CWT (morlet2): log-frequency view
    w0 = 6.0
    freqs = np.geomspace(30.0, 450.0, 48)
    scales = w0 * fs / (2 * np.pi * freqs)
    C = np.abs(np.asarray(ftt.device_get_complex(
        ftt.cwt(x, scales, "morlet2", w=w0))))
    cerr = [abs(freqs[np.argmax(C[:, i])] - finst[i])
            for i in range(n // 8, 7 * n // 8, 64)]
    print(f"CWT (morlet2) ridge: mean |f_est - f_inst| = "
          f"{np.mean(cerr):.1f} Hz (48 log-spaced scales)")

    # 4. multitaper PSD of the whole record (stationary view: the chirp
    # spreads its energy across the swept band)
    f, P = ftt.multitaper(x, fs=fs, NW=4.0, weights="adaptive")
    P = np.asarray(P, np.float64)
    band = (f >= f0) & (f <= f1)
    frac = P[band].sum() / P.sum()
    print(f"multitaper: {frac:.1%} of power inside the swept band "
          f"[{f0:.0f}, {f1:.0f}] Hz")

    assert np.mean(ridge_err) < 2 * st.delta_f
    assert np.mean(werr) < 5.0
    assert frac > 0.9


if __name__ == "__main__":
    main()
