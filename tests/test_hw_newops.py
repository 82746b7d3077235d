"""Hardware tier for the round-2 continuation ops: frft, ShortTimeFFT,
multitaper/DPSS, Wigner-Ville, ND type-3 NUFFT, Chebyshev, DHT, NLSE —
small shapes, planar transfers only (axon cannot move complex arrays,
CLAUDE.md invariant).

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


def test_frft_roundtrip_and_dft_case(ftt, rng):
    n = 128
    # Fractional-order roundtrip needs an ADMISSIBLE (time-frequency-
    # concentrated) signal — white noise fills the TF square and the
    # chirp algorithm provably loses its corners (~48% L2; the numpy
    # replica of the algorithm fails identically — ops/frft.py
    # docstring).  Mirror tests/test_frft.py's Gaussian-envelope signal.
    g = (np.arange(n) - n // 2) / np.sqrt(n)
    x = (np.exp(-g * g) * (1 + 0.3 * np.cos(2 * np.pi * g))
         + 0.1j * np.exp(-((g - 1.0) ** 2))).astype(np.complex64)
    F = ftt.frft(x, 0.7)
    rec = ftt.device_get_complex(ftt.frft(F, -0.7))
    assert _rel(rec, x) < TOL
    # integer order stays exact for ANY input, including white noise
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    shft = (np.arange(n) + n // 2) % n
    want = np.empty(n, complex)
    want[shft] = np.fft.fft(z[shft]) / np.sqrt(n)
    assert _rel(ftt.device_get_complex(ftt.frft(z, 1.0)), want) < TOL
    # the eigenvector dfrft is the exact-unitary complement for
    # inadmissible inputs: roundtrip must hold on noise
    rec2 = ftt.device_get_complex(ftt.dfrft(ftt.dfrft(z, 0.7), -0.7))
    assert _rel(rec2, z) < TOL


def test_short_time_fft_roundtrip(ftt, rng):
    import scipy.signal as ss

    w = ss.windows.hann(16, sym=False)
    st = ftt.ShortTimeFFT(w, 4, 8.0)
    x = rng.standard_normal(200).astype(np.float32)
    S = st.stft(x)
    want = ss.ShortTimeFFT(w, 4, 8.0).stft(x)
    assert _rel(ftt.device_get_complex(S), want) < TOL
    xr = np.asarray(st.istft(S, k1=len(x)))
    assert np.abs(xr - x).max() < TOL


def test_multitaper_white_noise(ftt, rng):
    x = rng.standard_normal(1024).astype(np.float32)
    f, S = ftt.multitaper(x, fs=1.0, NW=4.0, weights="adaptive",
                          detrend=False)
    S = np.asarray(S, np.float64)
    assert np.all(S > 0)
    total = np.sum(S * (f[1] - f[0]))
    assert 0.7 < total < 1.3


def test_wigner_ville_tone(ftt):
    n, f0 = 128, 0.2
    t = np.arange(n)
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    f, W = ftt.wigner_ville(x)
    W = np.asarray(W)
    assert abs(f[np.argmax(W[n // 2])] - f0) < 0.01


def test_nufft2d3_vs_direct(ftt, rng):
    M, K = 80, 50
    x = rng.uniform(-2.0, 2.0, M).astype(np.float32)
    y = rng.uniform(-1.0, 3.0, M).astype(np.float32)
    c = (rng.standard_normal(M) + 1j * rng.standard_normal(M)
         ).astype(np.complex64)
    s = rng.uniform(-8.0, 8.0, K).astype(np.float32)
    t = rng.uniform(-6.0, 6.0, K).astype(np.float32)
    want = np.exp(1j * (s[:, None].astype(np.float64) * x[None, :]
                        + t[:, None].astype(np.float64) * y[None, :])
                  ) @ c.astype(np.complex128)
    got = ftt.device_get_complex(ftt.nufft2d3(x, y, c, s, t))
    assert _rel(got, want) < 5e-4


def test_chebyshev_derivative(ftt):
    n = 32
    x = np.asarray(ftt.cheb_points(n), np.float64)
    got = np.asarray(ftt.cheb_derivative(np.exp(x).astype(np.float32)),
                     np.float64)
    assert _rel(got, np.exp(x)) < 1e-3


def test_dht_self_inverse(ftt, rng):
    x = rng.standard_normal((4, 256)).astype(np.float32)
    y = np.asarray(ftt.idht(np.asarray(ftt.dht(x))))
    assert np.abs(y - x).max() < TOL


def test_nlse_soliton(ftt):
    from fft_wgpu_tpu.models import bright_soliton, nlse_init, nlse_rollout

    n, L, dt, steps = 256, 40.0, 1e-3, 500
    c = nlse_init((n,), L, dt, g=1.0)
    fr, fi = nlse_rollout(c, bright_soliton(n, L), steps)
    got = np.asarray(fr, np.float64) + 1j * np.asarray(fi, np.float64)
    wr, wi = bright_soliton(n, L, t=steps * dt)
    want = np.asarray(wr, np.float64) + 1j * np.asarray(wi, np.float64)
    assert _rel(got, want) < 1e-3


def test_fft2_fused_plane_production_route(ftt, rng):
    """Batched trailing-2D fftn must ride the fused-plane kernel on TPU
    (nd.py routes >=8 planes inside the A*B <= 2^16 envelope) and match
    numpy; 3-D fftn stacks the fused plane with an ax0 axis pass."""
    x = (rng.standard_normal((16, 256, 256))
         + 1j * rng.standard_normal((16, 256, 256))).astype(np.complex64)
    got = ftt.device_get_complex(ftt.fft2(ftt.device_put_complex(x)))
    assert _rel(got, np.fft.fft2(x)) < TOL
    y = (rng.standard_normal((32, 128, 128))
         + 1j * rng.standard_normal((32, 128, 128))).astype(np.complex64)
    got3 = ftt.device_get_complex(ftt.fftn(ftt.device_put_complex(y)))
    assert _rel(got3, np.fft.fftn(y)) < TOL


def test_waveforms_through_device_fft(ftt):
    """MLS autocorrelation impulse via the device FFT path, scalar-free
    planar transfers; chirp spectrum peak sits at the sweep band."""
    seq, _ = ftt.max_len_seq(12)
    s = (2.0 * seq[:4095] - 1.0).astype(np.complex64)
    S = ftt.device_get_complex(ftt.fft(ftt.device_put_complex(s[None])))[0]
    ac = np.fft.ifft(S * np.conj(S)).real
    assert abs(ac[0] - 4095) < 1e-1
    assert np.abs(ac[1:] + 1.0).max() < 1e-1
