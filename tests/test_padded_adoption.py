"""Padded-spectrum adoption audit (VERDICT r3 item 5).

The numpy-parity R2C/C2R shapes have a ragged n//2+1 minor that halves
the TPU kernels' DMA rate (probe_r45); internal round-trip / reducing
pipelines are supposed to ride the PADDED serving forms
([.., pad_bins(n)], `rfft pad_out=True` / `irfft padded_in=True`)
end-to-end.  Round 3 claimed this without a test; this file PROVES it by
lowering the top pipelines with the real TPU routing (backend faked to
"tpu", Pallas in force_tpu_interpret_mode so the kernels execute on CPU)
and asserting that

  * no BIG ragged-minor (n//2+1-column) intermediate appears in the
    traced jaxpr — only the final, tiny, public-boundary arrays may
    carry the ragged bin count (the jaxpr carries every intermediate
    aval; HLO text is unavailable here because interpret-mode Pallas
    lowers to IO callbacks); and
  * the pipelines remain numerically correct vs scipy in this mode.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal as sig

from fft_wgpu_tpu.ops import pallas_fft as pf

N = 4096
RAGGED = N // 2 + 1  # 2049
PADDED = 2176        # pad_bins(4096) = round_up(2049, 128)
BATCH = 128


@pytest.fixture
def fake_tpu(monkeypatch):
    """Route exactly as on TPU hardware, executing Pallas interpreted
    (the module-level force flag; pltpu.force_tpu_interpret_mode lowers
    to IO callbacks whose effects linear_call rejects)."""
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


def _big_ragged_shapes(jaxpr_text):
    """All avals in the jaxpr with a 2049 minor and a large leading
    extent (the final averaged/public arrays are allowed)."""
    hits = []
    for m in re.finditer(rf"(?:f32|c64)\[([0-9,]+),{RAGGED}\]",
                         jaxpr_text):
        lead = [int(d) for d in m.group(1).split(",") if d]
        if lead and max(lead) >= 64:
            hits.append(m.group(0))
    return hits


def test_fftconvolve_rides_padded_forms(fake_tpu):
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(0)
    a = rng.standard_normal((BATCH, 3000)).astype(np.float32)
    b = rng.standard_normal(257).astype(np.float32)

    fn = jax.jit(lambda u, v: ftt.fftconvolve(u, v[None, :], mode="full"))
    txt = str(jax.make_jaxpr(lambda u, v: ftt.fftconvolve(
        u, v[None, :], mode="full"))(a, b))
    assert f",{PADDED}]" in txt, "padded serving form absent from jaxpr"
    bad = _big_ragged_shapes(txt)
    assert not bad, f"ragged-minor intermediates in fftconvolve: {bad[:4]}"

    # numerics on a small row slice (interpret mode is slow on CPU)
    out = np.asarray(fn(a[:8], b))
    ref = sig.fftconvolve(a[:8], b[None, :], mode="full")
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 1e-4


def test_welch_rides_padded_forms(fake_tpu):
    """1-D welch now rides the FUSED segment-spectrum kernel (round 5,
    ops/pallas_welch.py — no big spectrum array exists at all); the
    composed path (taken for batched input) must still ride the padded
    serving form."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(1)
    x = rng.standard_normal(N * 8).astype(np.float32)

    f1, p1 = ftt.welch(x, nperseg=N)
    f2, p2 = sig.welch(x, nperseg=N)
    err = np.linalg.norm(np.asarray(p1) - p2) / np.linalg.norm(p2)
    assert err < 1e-4

    from fft_wgpu_tpu.ops import pallas_welch as pw
    from fft_wgpu_tpu.ops import spectral_est as se

    # (a) the 1-D path takes the fused kernel.  The parity call above
    # cached the traced executable, and spies only fire at TRACE time —
    # drop the cache entry so the spied call re-traces.
    from fft_wgpu_tpu.utils.jit_cache import _CACHE

    _CACHE.clear()
    called = {}
    orig_fused = pw.welch_accum_split

    def spy_fused(*a, **k):
        called["fused"] = True
        return orig_fused(*a, **k)

    pw.welch_accum_split = spy_fused
    try:
        ftt.welch(x, nperseg=N)
    finally:
        pw.welch_accum_split = orig_fused
    assert called.get("fused"), "1-D welch did not take the fused kernel"

    # (b) the composed path (median averaging is outside the fused
    # envelope — it needs per-segment spectra) still rides the padded
    # per-segment spectrum, and the fused framed-R2C inside
    # _spec_segments_split is bypassed by detrend="linear"
    captured = {}
    orig = se._spec_segments_split

    def spy(xr, xi, win, nperseg, hop, nfft, detrend, pad_out=False):
        captured["pad_out"] = pad_out
        out = orig(xr, xi, win, nperseg, hop, nfft, detrend, pad_out)
        captured["bins"] = out[0].shape[-1]
        return out

    se._spec_segments_split = spy
    try:
        ftt.welch(np.stack([x, x]), nperseg=N, average="median",
                  detrend="linear")
    finally:
        se._spec_segments_split = orig
    assert captured["pad_out"] is True
    assert captured["bins"] == PADDED


def test_oaconvolve_rides_padded_forms(fake_tpu):
    """oaconvolve's segmented real path must keep the padded serving
    forms from the batched segment R2C through the filter multiply to
    the C2R (VERDICT r3 item 5 straggler, converted this round)."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(2)
    a = rng.standard_normal(20000).astype(np.float32)
    b = rng.standard_normal(129).astype(np.float32)

    txt = str(jax.make_jaxpr(
        lambda u, v: ftt.oaconvolve(u, v, mode="full"))(a, b))
    bad = []
    for m in re.finditer(r"(?:f32|c64)\[([0-9,]+)\]", txt):
        dims = [int(d) for d in m.group(1).split(",") if d]
        # any big array whose minor is an r2c ragged count (2^k//2+1)
        if (len(dims) >= 2 and dims[-1] > 64 and dims[-1] % 2 == 1
                and max(dims[:-1]) >= 8):
            bad.append(m.group(0))
    assert not bad, f"ragged-minor intermediates in oaconvolve: {bad[:4]}"

    out = np.asarray(ftt.oaconvolve(a, b, mode="full"))
    ref = sig.oaconvolve(a, b, mode="full")
    err = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert err < 1e-4


def test_fused_chirp_paths(fake_tpu):
    """The fused Bluestein/CZT kernels (chirp+pad in the forward load,
    filter+slice+chirp in the inverse load/store) through the real TPU
    routing: non-pow2 fft, prime fft, czt with custom (w, a), zoom_fft."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((4, 1000))
         + 1j * rng.standard_normal((4, 1000))).astype(np.complex64)

    got = np.asarray(jax.device_get(ftt.fft(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5

    xp = x[:, :521]  # prime length
    got = np.asarray(jax.device_get(ftt.fft(xp)))
    ref = np.fft.fft(xp, axis=-1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5

    got = np.asarray(jax.device_get(ftt.czt(xp, m=300)))
    ref = sig.czt(np.asarray(xp, np.complex128), m=300)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4

    got = np.asarray(jax.device_get(
        ftt.zoom_fft(xp.real, [0.1, 0.4], m=256)))
    ref = sig.zoom_fft(np.asarray(xp.real, np.float64), [0.1, 0.4], m=256)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-4


def test_rfft_odd_composite(fake_tpu):
    """Odd composite lengths ride the single-pass general R2C kernel
    through the public rfft (round 4)."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(6)
    x = rng.standard_normal((6, 1005)).astype(np.float32)
    got = np.asarray(jax.device_get(ftt.rfft(x)))
    ref = np.fft.rfft(x, axis=-1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


@pytest.mark.parametrize("n", [4097, 771, 1000])
def test_rfft_general_extended_envelope(fake_tpu, n):
    """Round 5: the general R2C routes even non-pow2 (1000) and the
    extended factor<=256 envelope (4097 = 17*241, 771 = 3*257) after
    the toolchain update cleared the >128-prime compile hang
    (probe_r70/r71)."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(7)
    x = rng.standard_normal((4, n)).astype(np.float32)
    got = np.asarray(jax.device_get(ftt.rfft(x)))
    ref = np.fft.rfft(x, axis=-1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_fft_prime241_factor(fake_tpu):
    """C2C with a 128<prime<=256 factor rides the one-pass general
    kernel (was Bluestein: 1.553 -> 0.878 ms at 4097x1024 on hw)."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(8)
    x = (rng.standard_normal((3, 514))
         + 1j * rng.standard_normal((3, 514))).astype(np.complex64)
    got = np.asarray(jax.device_get(ftt.fft(x)))
    ref = np.fft.fft(x, axis=-1)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5

    # 2-D: ax0 pass at n=514 uses the (2,257) sublane split
    y = (rng.standard_normal((2, 514, 257))
         + 1j * rng.standard_normal((2, 514, 257))).astype(np.complex64)
    got = np.asarray(jax.device_get(ftt.fft(y, axis=-2)))
    ref = np.fft.fft(y, axis=-2)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5


def test_fft2_composite_axes(fake_tpu):
    """ND transforms on composite non-pow2 shapes ride the round-4
    kernels per axis (general rows for -1, composite ax0 for -2) —
    no moveaxis relayouts, real TPU routing."""
    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(4)
    x = (rng.standard_normal((2, 640, 640))
         + 1j * rng.standard_normal((2, 640, 640))).astype(np.complex64)
    got = np.asarray(jax.device_get(ftt.fft2(x)))
    ref = np.fft.fft2(x)
    assert np.linalg.norm(got - ref) / np.linalg.norm(ref) < 1e-5
