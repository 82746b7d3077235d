"""Differential fuzz for the fused segment-spectrum surfaces (round 5).

Random configurations across the fused kernels' envelope EDGES — K in
{1..8}, nfft == / > nperseg, ragged last blocks, exact block multiples,
batched and complex inputs, both averages — all under the fake-tpu
routing so every case exercises the kernels (interpret mode), asserted
against scipy.  Envelope-excluded configs must still match scipy via
the composed path (the router must never wedge between paths).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
import scipy.signal as sig

from fft_wgpu_tpu.ops import pallas_fft as pf


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


def _rel(got, want):
    got = np.asarray(got, np.complex128)
    want = np.asarray(want, np.complex128)
    return float(np.linalg.norm(got - want) / np.linalg.norm(want))


# (t, nperseg, hop, nfft, detrend, average, batch, complex)
CASES = [
    # exact one block of segments (num == 128 boundary)
    (512 * 1 + 127 * 256, 512, 256, 512, "constant", "mean", None, False),
    # num == 129: one-segment ragged tail
    (512 + 128 * 256, 512, 256, 512, "constant", "mean", None, False),
    # K == 8 (the _MAX_K edge), no detrend
    (8192, 512, 64, 512, False, "mean", None, False),
    # K == 1 with nfft zero-pad
    (6144, 512, 512, 1024, "constant", "mean", None, False),
    # median averaging through the fused psd kernel
    (16384, 1024, 512, 1024, "constant", "median", None, False),
    # batched + complex input (two-sided C2C variant)
    (4096, 512, 256, 512, "constant", "mean", 3, True),
    # complex 1-D
    (8192, 1024, 512, 1024, False, "mean", None, True),
    # OUT of envelope: hop does not divide nperseg (composed path)
    (8192, 600, 257, 600, "constant", "mean", None, False),
    # OUT of envelope: non-pow2 nfft (composed path)
    (8192, 500, 250, 500, "constant", "mean", None, False),
    # OUT of envelope: linear detrend
    (8192, 512, 256, 512, "linear", "mean", None, False),
]


@pytest.mark.parametrize("t,nperseg,hop,nfft,detrend,average,batch,cplx",
                         CASES)
def test_welch_fuzz(fake_tpu, rng, t, nperseg, hop, nfft, detrend,
                    average, batch, cplx):
    import fft_wgpu_tpu as ftt

    shape = (t,) if batch is None else (batch, t)
    x = rng.standard_normal(shape).astype(np.float32)
    if cplx:
        x = (x + 1j * rng.standard_normal(shape)).astype(np.complex64)
    kw = dict(nperseg=nperseg, noverlap=nperseg - hop, nfft=nfft,
              detrend=detrend, average=average)
    f1, p1 = ftt.welch(x, **kw)
    f2, p2 = sig.welch(x, **kw)
    err = _rel(p1, p2)
    assert err < 1e-4, f"welch {err:.3e}"


@pytest.mark.parametrize("t,nperseg,hop,nfft,detrend,average,batch,cplx",
                         CASES[:7])
def test_spectrogram_fuzz(fake_tpu, rng, t, nperseg, hop, nfft, detrend,
                          average, batch, cplx):
    import fft_wgpu_tpu as ftt

    shape = (t,) if batch is None else (batch, t)
    x = rng.standard_normal(shape).astype(np.float32)
    if cplx:
        x = (x + 1j * rng.standard_normal(shape)).astype(np.complex64)
    kw = dict(nperseg=nperseg, noverlap=nperseg - hop, nfft=nfft,
              detrend=detrend)
    f1, t1, S1 = ftt.spectrogram(x, **kw)
    f2, t2, S2 = sig.spectrogram(x, **kw)
    assert np.asarray(S1).shape == S2.shape
    err = _rel(S1, S2)
    assert err < 1e-4, f"spectrogram {err:.3e}"


@pytest.mark.parametrize("t,nperseg,hop,nfft,detrend,average,batch,cplx",
                         [c for c in CASES if not c[7]][:6])
def test_csd_fuzz(fake_tpu, rng, t, nperseg, hop, nfft, detrend, average,
                  batch, cplx):
    import fft_wgpu_tpu as ftt
    from fft_wgpu_tpu import device_get_complex as dget

    shape = (t,) if batch is None else (batch, t)
    x = rng.standard_normal(shape).astype(np.float32)
    y = rng.standard_normal(shape).astype(np.float32)
    kw = dict(nperseg=nperseg, noverlap=nperseg - hop, nfft=nfft,
              detrend=detrend)
    if average == "median":
        return  # scipy csd median differs only in bias handling; skip
    f1, c1 = ftt.csd(x, y, **kw)
    f2, c2 = sig.csd(x, y, **kw)
    err = _rel(dget(c1), c2)  # planar transfer (CLAUDE.md invariant)
    assert err < 1e-4, f"csd {err:.3e}"
