"""Hardware tier for the round-5 paths: fused segment-spectrum kernels
(welch/csd/spectrogram/stft), the extended factor<=256 general-kernel
envelope, the open general R2C routing, and the fast dot-precision
mode — small shapes, planar transfers only (CLAUDE.md invariant).

Run:  FFT_WGPU_TPU_HW=1 python -m pytest tests/ -m tpu -q
"""

import numpy as np
import pytest

pytestmark = pytest.mark.tpu

TOL = 1e-4


@pytest.fixture(scope="module")
def ftt():
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend available")
    import fft_wgpu_tpu

    return fft_wgpu_tpu


def _rel(got, want):
    return float(np.linalg.norm(np.asarray(got) - want)
                 / np.linalg.norm(want))


def test_welch_csd_fused(ftt, rng):
    import scipy.signal as sig

    x = rng.standard_normal(1 << 15).astype(np.float32)
    y = rng.standard_normal(1 << 15).astype(np.float32)
    f1, p1 = ftt.welch(x, nperseg=512)
    f2, p2 = sig.welch(x, nperseg=512)
    assert _rel(p1, p2) < TOL
    f1, c1 = ftt.csd(x, y, nperseg=512)
    f2, c2 = sig.csd(x, y, nperseg=512)
    assert _rel(ftt.device_get_complex(c1), c2) < TOL


def test_spectrogram_fused_modes(ftt, rng):
    import scipy.signal as sig

    x = rng.standard_normal(1 << 15).astype(np.float32)
    for mode in ("psd", "magnitude", "complex"):
        f1, t1, S1 = ftt.spectrogram(x, nperseg=512, mode=mode)
        f2, t2, S2 = sig.spectrogram(x, nperseg=512, mode=mode)
        got = (ftt.device_get_complex(S1) if mode == "complex"
               else np.asarray(S1))
        assert _rel(got, S2) < TOL, mode


def test_stft_fused_roundtrip(ftt, rng):
    x = rng.standard_normal(1 << 14).astype(np.float32)
    Z = ftt.stft(x, n_fft=512, hop_length=128)
    y = np.asarray(ftt.istft(Z, n_fft=512, hop_length=128,
                             length=len(x)))
    assert _rel(y, x) < TOL


def test_extended_envelope_fft(ftt, rng):
    """(17,241)/(3,257) general kernels through the public fft/rfft
    (round-5 factor<=256 envelope, probe_r70/r71)."""
    for n in (4097, 771):
        z = (rng.standard_normal((32, n))
             + 1j * rng.standard_normal((32, n))).astype(np.complex64)
        got = ftt.device_get_complex(ftt.fft(z))
        assert _rel(got, np.fft.fft(z, axis=-1)) < TOL, n
        x = rng.standard_normal((32, n)).astype(np.float32)
        got = ftt.device_get_complex(ftt.rfft(x))
        assert _rel(got, np.fft.rfft(x, axis=-1)) < TOL, n


def test_rfft_general_even_nonpow2(ftt, rng):
    x = rng.standard_normal((32, 1000)).astype(np.float32)
    got = ftt.device_get_complex(ftt.rfft(x))
    assert _rel(got, np.fft.rfft(x, axis=-1)) < TOL


def test_batched_big_kernel(ftt, rng):
    """Batched rows through the single-pass big kernel (probe_r72
    crossover: n <= 2^16 batched rides it via the auto routing)."""
    z = (rng.standard_normal((16, 1 << 16))
         + 1j * rng.standard_normal((16, 1 << 16))).astype(np.complex64)
    got = ftt.device_get_complex(ftt.fft(z))
    assert _rel(got, np.fft.fft(z, axis=-1)) < TOL


def test_conv_fused_epilogues(ftt, rng):
    """fftconvolve/oaconvolve through the fused product-C2R and the
    scatter-free overlap-add."""
    import scipy.signal as sig

    a = rng.standard_normal((8, 3000)).astype(np.float32)
    b = rng.standard_normal(257).astype(np.float32)
    got = np.asarray(ftt.fftconvolve(a, b[None, :], mode="full"))
    assert _rel(got, sig.fftconvolve(a, b[None, :], mode="full")) < TOL

    x = rng.standard_normal(1 << 17).astype(np.float32)
    h = rng.standard_normal(129).astype(np.float32)
    got = np.asarray(ftt.oaconvolve(x, h, mode="same"))
    assert _rel(got, sig.oaconvolve(x, h, mode="same")) < TOL

    z = ftt.device_get_complex(ftt.hilbert(x[:4096]))
    assert _rel(z, sig.hilbert(x[:4096].astype(np.float64))) < TOL


def test_coherence_fused(ftt, rng):
    import scipy.signal as sig

    x = rng.standard_normal(1 << 15).astype(np.float32)
    y = (0.5 * x + 0.5 * rng.standard_normal(1 << 15)).astype(np.float32)
    f1, c1 = ftt.coherence(x, y, nperseg=512)
    f2, c2 = sig.coherence(x, y, nperseg=512)
    assert _rel(np.asarray(c1), c2) < TOL


def test_fast_dot_precision(ftt, rng):
    """fast mode: correct to ~3e-3 and restores cleanly."""
    z = (rng.standard_normal((64, 2048))
         + 1j * rng.standard_normal((64, 2048))).astype(np.complex64)
    want = np.fft.fft(z, axis=-1)
    try:
        ftt.set_dot_precision("fast")
        got = ftt.device_get_complex(ftt.fft(z))
        assert _rel(got, want) < 2e-2  # bf16-dot accuracy class
    finally:
        ftt.set_dot_precision("accurate")
    got = ftt.device_get_complex(ftt.fft(z))
    assert _rel(got, want) < TOL
