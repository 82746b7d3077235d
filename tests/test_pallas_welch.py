"""Fused segment-spectrum kernels (ops/pallas_welch.py, VERDICT r4 item 7).

Kernel-level parity in interpret mode, plus the routed welch/spectrogram
surfaces under the fake-tpu mechanism vs scipy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sig

from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops import pallas_welch as pw


@pytest.fixture
def fake_tpu(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(pf, "_FORCE_INTERPRET", True)
    from fft_wgpu_tpu.utils.jit_cache import _CACHE

    _CACHE.clear()  # cached executables skip re-tracing (spies/backend)
    yield
    # traces made under the faked backend must not leak into other tests
    jax.clear_caches()
    _CACHE.clear()
    from fft_wgpu_tpu.plan.plan import get_plan

    get_plan.cache_clear()


def _ref_power_sum(x, win, nperseg, hop, nfft, detrend):
    """Composed reference: sum over segments of |rfft(win*frame)|^2."""
    num = 1 + (len(x) - nperseg) // hop
    acc = np.zeros(nfft // 2 + 1)
    for s in range(num):
        fr = x[s * hop: s * hop + nperseg].astype(np.float64)
        if detrend == "constant":
            fr = fr - fr.mean()
        X = np.fft.rfft(fr * win, n=nfft)
        acc += np.abs(X) ** 2
    return acc, num


@pytest.mark.parametrize(
    "t,nperseg,hop,nfft,detrend",
    [
        (4096, 512, 256, 512, "constant"),   # K=2, ragged last block
        (8192, 512, 128, 512, False),        # K=4
        (4096, 512, 512, 512, "constant"),   # K=1 (no overlap)
        (4096, 512, 256, 1024, False),       # nfft zero-pad
    ],
)
def test_welch_accum_kernel_parity(rng, t, nperseg, hop, nfft, detrend):
    x = rng.standard_normal(t).astype(np.float32)
    win = sig.get_window("hann", nperseg).astype(np.float32)
    psum, num = jax.jit(
        lambda v: pw.welch_accum_split(v, win, nperseg, hop, nfft,
                                       detrend, interpret=True)
    )(jnp.asarray(x))
    ref, rnum = _ref_power_sum(x, win, nperseg, hop, nfft, detrend)
    assert num == rnum
    err = np.linalg.norm(np.asarray(psum) - ref) / np.linalg.norm(ref)
    assert err < 1e-5, f"fused welch accum: {err:.3e}"


def test_spec_psd_kernel_parity(rng):
    t, nperseg, hop = 4096, 512, 384  # hop !| nperseg -> unsupported
    with pytest.raises(pw.Unsupported):
        pw.welch_accum_split(jnp.zeros(t), np.ones(nperseg, np.float32),
                             nperseg, hop, nperseg, False, interpret=True)

    hop = 256
    x = rng.standard_normal(t).astype(np.float32)
    win = sig.get_window("hann", nperseg).astype(np.float32)
    S = jax.jit(
        lambda v: pw.spec_psd_split(v, win, nperseg, hop, nperseg,
                                    "constant", interpret=True)
    )(jnp.asarray(x))
    num = 1 + (t - nperseg) // hop
    assert S.shape == (num, nperseg // 2 + 1)
    for s in (0, num // 2, num - 1):
        fr = x[s * hop: s * hop + nperseg].astype(np.float64)
        fr = fr - fr.mean()
        ref = np.abs(np.fft.rfft(fr * win)) ** 2
        err = np.linalg.norm(np.asarray(S[s]) - ref) / np.linalg.norm(ref)
        assert err < 1e-5, f"segment {s}: {err:.3e}"


def test_welch_routed_fused(fake_tpu, rng):
    """Public welch rides the fused kernel on TPU routing and matches
    scipy exactly like the composed path."""
    import fft_wgpu_tpu as ftt
    from fft_wgpu_tpu.ops import spectral_est as se

    x = rng.standard_normal(8192).astype(np.float32)

    called = {}
    orig = pw.welch_accum_split

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    se_pw = pw
    se_pw.welch_accum_split, restore = spy, orig
    try:
        f1, p1 = ftt.welch(x, nperseg=512)
    finally:
        se_pw.welch_accum_split = restore
    assert called.get("yes"), "fused welch path was not taken"
    f2, p2 = sig.welch(x, nperseg=512)
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4, f"welch fused vs scipy: {err:.3e}"


def test_spectrogram_routed_fused(fake_tpu, rng):
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(8192).astype(np.float32)
    f1, t1, S1 = ftt.spectrogram(x, nperseg=512)
    f2, t2, S2 = sig.spectrogram(x, nperseg=512)
    assert np.asarray(S1).shape == S2.shape
    err = np.linalg.norm(np.asarray(S1) - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"spectrogram fused vs scipy: {err:.3e}"


def test_spec_rfft_split_kernel_parity(rng):
    """Fused framed R2C (split spectra) vs composed numpy framing."""
    t, nperseg, hop = 4096, 512, 256
    x = rng.standard_normal(t).astype(np.float32)
    win = sig.get_window("hann", nperseg).astype(np.float32)
    Xr, Xi = jax.jit(
        lambda v: pw.spec_rfft_split(v, win, nperseg, hop, nperseg,
                                     "constant", interpret=True)
    )(jnp.asarray(x))
    num = 1 + (t - nperseg) // hop
    assert Xr.shape == (num, nperseg // 2 + 1)
    got = np.asarray(Xr) + 1j * np.asarray(Xi)
    for s in range(num):
        fr = x[s * hop: s * hop + nperseg].astype(np.float64)
        ref = np.fft.rfft((fr - fr.mean()) * win)
        err = np.linalg.norm(got[s] - ref) / np.linalg.norm(ref)
        assert err < 1e-5, f"segment {s}: {err:.3e}"
    # padded serving form
    Xr, Xi = pw.spec_rfft_split(jnp.asarray(x), win, nperseg, hop,
                                nperseg, "constant", pad_out=True,
                                interpret=True)
    assert Xr.shape[-1] == 384  # pad_bins(512)
    assert float(jnp.max(jnp.abs(Xr[:, nperseg // 2 + 1:]))) == 0.0


def test_spectrogram_complex_routed(fake_tpu, rng):
    """spectrogram mode='complex' (via _spec_segments_split) rides the
    fused framed-R2C kernel and matches scipy."""
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(8192).astype(np.float32)
    f1, t1, S1 = ftt.spectrogram(x, nperseg=512, mode="complex")
    f2, t2, S2 = sig.spectrogram(x, nperseg=512, mode="complex")
    err = np.linalg.norm(np.asarray(S1) - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"spectrogram complex fused vs scipy: {err:.3e}"


def test_stft_routed_fused(fake_tpu, rng):
    """Public stft (1-D, center) rides the fused framed-R2C kernel and
    matches scipy's ShortTimeFFT-equivalent composed result."""
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(4096).astype(np.float32)
    Z = ftt.stft(x, n_fft=512, hop_length=128)
    # composed reference (numpy): same framing/window conventions
    win = np.hanning(512 + 1)[:-1].astype(np.float32)  # periodic hann
    xp = np.pad(x, (256, 256), mode="reflect")
    num = 1 + (len(xp) - 512) // 128
    ref = np.stack([
        np.fft.rfft(xp[s * 128: s * 128 + 512] * win) for s in range(num)
    ]).T
    got = np.asarray(jnp.real(Z)) + 1j * np.asarray(jnp.imag(Z))
    assert got.shape == ref.shape
    err = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert err < 1e-5, f"stft fused vs composed numpy: {err:.3e}"
    # round trip through istft (the COLA overlap-add inverse)
    y = np.asarray(ftt.istft(Z, n_fft=512, hop_length=128, length=4096))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-5, f"istft roundtrip: {err:.3e}"


def test_csd_kernel_parity(rng):
    t, nperseg, hop = 8192, 512, 256
    x = rng.standard_normal(t).astype(np.float32)
    y = rng.standard_normal(t).astype(np.float32)
    win = sig.get_window("hann", nperseg).astype(np.float32)
    Pr, Pi, num = jax.jit(
        lambda u, v: pw.csd_accum_split(u, v, win, nperseg, hop, nperseg,
                                        "constant", interpret=True)
    )(jnp.asarray(x), jnp.asarray(y))
    acc = np.zeros(nperseg // 2 + 1, np.complex128)
    for s in range(num):
        fx = x[s * hop: s * hop + nperseg].astype(np.float64)
        fy = y[s * hop: s * hop + nperseg].astype(np.float64)
        X = np.fft.rfft((fx - fx.mean()) * win)
        Y = np.fft.rfft((fy - fy.mean()) * win)
        acc += np.conj(X) * Y
    got = np.asarray(Pr) + 1j * np.asarray(Pi)
    err = np.linalg.norm(got - acc) / np.linalg.norm(acc)
    assert err < 1e-5, f"fused csd accum: {err:.3e}"


def test_csd_routed_fused(fake_tpu, rng):
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(8192).astype(np.float32)
    y = rng.standard_normal(8192).astype(np.float32)
    f1, p1 = ftt.csd(x, y, nperseg=512)
    f2, p2 = sig.csd(x, y, nperseg=512)
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4, f"csd fused vs scipy: {err:.3e}"

    f1, c1 = ftt.coherence(x, y, nperseg=512)
    f2, c2 = sig.coherence(x, y, nperseg=512)
    err = np.linalg.norm(np.asarray(c1) - c2) / np.linalg.norm(c2)
    assert err < 1e-4, f"coherence fused vs scipy: {err:.3e}"


def test_spectrogram_magnitude_routed(fake_tpu, rng):
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(8192).astype(np.float32)
    f1, t1, S1 = ftt.spectrogram(x, nperseg=512, mode="magnitude")
    f2, t2, S2 = sig.spectrogram(x, nperseg=512, mode="magnitude")
    err = np.linalg.norm(np.asarray(S1) - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"spectrogram magnitude fused vs scipy: {err:.3e}"


def test_welch_batched_fused(fake_tpu, rng):
    """Batched (2-D) welch/spectrogram now ride the fused kernels too
    (round 5: leading dims become a batch grid dimension)."""
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal((3, 4096)).astype(np.float32)
    f1, p1 = ftt.welch(x, nperseg=512)
    f2, p2 = sig.welch(x, nperseg=512)
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4, f"batched welch: {err:.3e}"

    f1, t1, S1 = ftt.spectrogram(x, nperseg=512)
    f2, t2, S2 = sig.spectrogram(x, nperseg=512)
    assert np.asarray(S1).shape == S2.shape
    err = np.linalg.norm(np.asarray(S1) - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"batched spectrogram: {err:.3e}"

    Z = ftt.stft(x, n_fft=512, hop_length=128)
    y = np.asarray(ftt.istft(Z, n_fft=512, hop_length=128, length=4096))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-5, f"batched stft roundtrip: {err:.3e}"


def test_c2c_accum_kernel_parity(rng):
    """Two-sided complex-input welch accumulator vs composed numpy."""
    t, nperseg, hop = 4096, 512, 256
    xr = rng.standard_normal(t).astype(np.float32)
    xi = rng.standard_normal(t).astype(np.float32)
    win = sig.get_window("hann", nperseg).astype(np.float32)
    psum, num = jax.jit(
        lambda a, b: pw.welch_accum_c2c_split(a, b, win, nperseg, hop,
                                              nperseg, "constant",
                                              interpret=True)
    )(jnp.asarray(xr), jnp.asarray(xi))
    z = (xr + 1j * xi).astype(np.complex128)
    acc = np.zeros(nperseg)
    for s in range(num):
        fr = z[s * hop: s * hop + nperseg]
        fr = fr - fr.mean()
        acc += np.abs(np.fft.fft(fr * win)) ** 2
    err = np.linalg.norm(np.asarray(psum) - acc) / np.linalg.norm(acc)
    assert err < 1e-5, f"c2c welch accum: {err:.3e}"


def test_welch_complex_routed_fused(fake_tpu, rng):
    """Complex-input (two-sided) welch and spectrogram ride the fused
    C2C kernels and match scipy."""
    import fft_wgpu_tpu as ftt

    z = (rng.standard_normal(8192)
         + 1j * rng.standard_normal(8192)).astype(np.complex64)
    f1, p1 = ftt.welch(z, nperseg=512)
    f2, p2 = sig.welch(z, nperseg=512)
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4, f"complex welch: {err:.3e}"

    f1, t1, S1 = ftt.spectrogram(z, nperseg=512)
    f2, t2, S2 = sig.spectrogram(z, nperseg=512)
    err = np.linalg.norm(np.asarray(S1) - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"complex spectrogram: {err:.3e}"

    f1, t1, S1 = ftt.spectrogram(z, nperseg=512, mode="complex")
    f2, t2, S2 = sig.spectrogram(z, nperseg=512, mode="complex")
    got = np.asarray(jnp.real(S1)) + 1j * np.asarray(jnp.imag(S1))
    err = np.linalg.norm(got - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"complex spectrogram complex-mode: {err:.3e}"


def test_short_time_fft_routed_fused(fake_tpu, rng):
    """ShortTimeFFT.stft (real input, onesided, default phase_shift=0
    which rolls every frame by m_num_mid) rides the fused framed-R2C
    kernel incl. the in-kernel lane roll, matching scipy exactly."""
    from scipy.signal import ShortTimeFFT as SciSTFT

    import fft_wgpu_tpu as ftt

    x = rng.standard_normal(4096).astype(np.float32)
    win = sig.get_window("hann", 512).astype(np.float32)
    ours = ftt.ShortTimeFFT(win, hop=128, fs=1.0)
    ref = SciSTFT(win, hop=128, fs=1.0)
    S1 = ours.stft(x)
    S2 = ref.stft(x)
    got = np.asarray(jnp.real(S1)) + 1j * np.asarray(jnp.imag(S1))
    assert got.shape == S2.shape
    err = np.linalg.norm(got - S2) / np.linalg.norm(S2)
    assert err < 1e-4, f"ShortTimeFFT fused vs scipy: {err:.3e}"
    # istft roundtrip through the same plan
    y = np.asarray(ours.istft(S1, k1=len(x)))
    err = np.linalg.norm(y - x) / np.linalg.norm(x)
    assert err < 1e-4, f"ShortTimeFFT istft roundtrip: {err:.3e}"


def test_welch_median_and_linear(fake_tpu, rng):
    """median average now rides the fused per-segment power kernel +
    XLA median (round 5); linear detrend stays composed.  Both must
    match scipy."""
    import fft_wgpu_tpu as ftt

    x = rng.standard_normal((3, 4096)).astype(np.float32)
    f1, p1 = ftt.welch(x, nperseg=512, average="median")
    f2, p2 = sig.welch(x, nperseg=512, average="median")
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4

    f1, p1 = ftt.welch(x[0], nperseg=512, detrend="linear")
    f2, p2 = sig.welch(x[0], nperseg=512, detrend="linear")
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4
