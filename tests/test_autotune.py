"""Autotuned executor selection (plan(n, autotune=True) — FFTW_MEASURE
analogue).  CPU tier: candidate enumeration, caching, and the no-op path
off-TPU; the measurement itself is exercised by the hardware tier."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu.plan import autotune
from fft_wgpu_tpu.plan.plan import Plan


class TestCandidates:
    def test_tpu_fused_envelope(self):
        c = autotune.candidates_for(4096, 4096, "tpu")
        assert "pallas:classic" in c and "pallas:dit" in c
        assert "xla" not in c  # big batches never want XLA on TPU

    def test_tpu_small_batch_includes_xla(self):
        assert "xla" in autotune.candidates_for(4096, 8, "tpu")

    def test_tpu_beyond_vmem(self):
        c = autotune.candidates_for(1 << 20, 1, "tpu")
        assert c == ["bigfft", "fourstep"]
        # batched large-N: bigfft is single-row only
        assert autotune.candidates_for(1 << 20, 4, "tpu") == ["fourstep"]

    def test_cpu_and_non_pow2(self):
        assert autotune.candidates_for(4096, 64, "cpu") == ["xla"]
        assert autotune.candidates_for(4095, 64, "tpu") == ["xla"]


class TestMeasureCaching:
    def test_single_candidate_skips_measurement(self, monkeypatch):
        autotune.TUNE_CACHE.clear()
        monkeypatch.setattr(autotune, "_wisdom_loaded", True)
        monkeypatch.setattr(autotune, "save_wisdom", lambda *a, **k: None)
        calls = []
        monkeypatch.setattr(autotune, "_slope_time",
                            lambda *a, **k: calls.append(1) or 1.0)
        p = Plan(4095, autotune=True)
        monkeypatch.setattr(autotune.jax, "default_backend", lambda: "tpu")
        ex = autotune.measure_executor(p, (4, 4095), -1)
        assert ex == "xla"
        assert not calls  # one candidate: nothing to measure

    def test_picks_fastest_and_caches(self, monkeypatch):
        autotune.TUNE_CACHE.clear()
        monkeypatch.setattr(autotune, "_wisdom_loaded", True)
        monkeypatch.setattr(autotune, "save_wisdom", lambda *a, **k: None)
        times = {"pallas:classic": 3.0, "pallas:dit": 1.0,
                 "pallas:balanced": 2.0}
        measured = []

        def fake_slope(fn, shape, **kw):
            # identify the candidate through the closure default
            ex = fn.__defaults__[0]
            measured.append(ex)
            return times[ex]

        monkeypatch.setattr(autotune, "_slope_time", fake_slope)
        monkeypatch.setattr(autotune.jax, "default_backend", lambda: "tpu")
        p = Plan(16384, autotune=True)
        ex = autotune.measure_executor(p, (256, 16384), -1)
        assert ex == "pallas:dit"
        assert set(measured) == {"pallas:classic", "pallas:dit",
                                 "pallas:balanced"}
        measured.clear()
        assert autotune.measure_executor(p, (256, 16384), -1) == "pallas:dit"
        assert not measured  # cached
        autotune.TUNE_CACHE.clear()

    def test_failed_candidate_skipped(self, monkeypatch):
        autotune.TUNE_CACHE.clear()
        monkeypatch.setattr(autotune, "_wisdom_loaded", True)
        monkeypatch.setattr(autotune, "save_wisdom", lambda *a, **k: None)

        def fake_slope(fn, shape, **kw):
            ex = fn.__defaults__[0]
            if ex == "pallas:dit":
                raise RuntimeError("does not compile")
            return 2.0

        monkeypatch.setattr(autotune, "_slope_time", fake_slope)
        monkeypatch.setattr(autotune.jax, "default_backend", lambda: "tpu")
        p = Plan(4096, autotune=True)
        ex = autotune.measure_executor(p, (512, 4096), -1)
        assert ex == "pallas:classic"
        autotune.TUNE_CACHE.clear()


class TestPlanIntegration:
    def test_autotune_plan_correct_on_cpu(self, rng):
        x = (rng.standard_normal((8, 512))
             + 1j * rng.standard_normal((8, 512))).astype(np.complex64)
        p = ftt.plan(512, autotune=True)
        got = np.asarray(ftt.device_get_complex(p.forward(x)))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=-1), rtol=2e-5,
                                   atol=2e-4)
        # off-TPU the tuner is a no-op: nothing cached for this n
        assert not any(k[1] == 512 for k in autotune.TUNE_CACHE)

    def test_schedule_executor_names_accepted(self):
        for ex in ("pallas:classic", "pallas:dit"):
            assert ftt.plan(1024, executor=ex).executor == ex

    def test_invalid_executor_rejected(self):
        with pytest.raises(ValueError):
            ftt.plan(512, executor="pallas:bogus")


# --------------------------------------------------------------------- #
# balanced-split tuning (tune_balanced)
# --------------------------------------------------------------------- #

def test_split_candidates_shape():
    from fft_wgpu_tpu.plan.autotune import split_candidates

    cands = split_candidates(4096)
    assert (256, 16, (4, 8, 8)) in cands
    assert (64, 64, (4, 4, 4)) in cands
    for n1, n2, chain in cands:
        assert n1 * n2 == 4096
        assert 8 <= n2 <= 128
        prod = 1
        for f in chain:
            prod *= f
        assert prod == n1
    assert split_candidates(97) == []  # non-pow2: nothing


def test_tune_balanced_requires_tpu():
    from fft_wgpu_tpu.plan.autotune import tune_balanced

    with pytest.raises(RuntimeError):
        tune_balanced(4096)


def test_split_wisdom_roundtrip(tmp_path):
    from fft_wgpu_tpu.plan import autotune as at

    p = str(tmp_path / "wisdom.json")
    at.SPLIT_CACHE[("TPU v5 lite", 4096)] = (256, 16, (4, 8, 8))
    at.save_wisdom(p)
    at.SPLIT_CACHE.clear()
    at.load_wisdom(p)
    assert at.SPLIT_CACHE[("TPU v5 lite", 4096)] == (256, 16, (4, 8, 8))
    del at.SPLIT_CACHE[("TPU v5 lite", 4096)]


def test_tune_extras_require_tpu():
    from fft_wgpu_tpu.plan.autotune import tune_ax0_tile, tune_fused_plane

    with pytest.raises(RuntimeError):
        tune_ax0_tile(256)
    with pytest.raises(RuntimeError):
        tune_fused_plane()


def test_extras_wisdom_roundtrip(tmp_path):
    from fft_wgpu_tpu.plan import autotune as at

    p = str(tmp_path / "wisdom.json")
    at.AX0_CACHE[("TPU vX", 256)] = 512
    at.PLANE_CACHE["TPU vX"] = 65536
    try:
        at.save_wisdom(p)
        at.AX0_CACHE.clear()
        at.PLANE_CACHE.clear()
        at.load_wisdom(p)
        assert at.AX0_CACHE[("TPU vX", 256)] == 512
        assert at.PLANE_CACHE["TPU vX"] == 65536
    finally:
        at.AX0_CACHE.pop(("TPU vX", 256), None)
        at.PLANE_CACHE.pop("TPU vX", None)


def test_wisdom_toolchain_stamp_invalidates(tmp_path):
    # wisdom measured on another jax/jaxlib (or the legacy unstamped
    # format) must be discarded, not trusted (VERDICT r2 weak #8)
    import json

    from fft_wgpu_tpu.plan import autotune as at

    p = str(tmp_path / "wisdom.json")
    at.SPLIT_CACHE[("TPU vY", 4096)] = (64, 64, (4, 4, 4))
    try:
        at.save_wisdom(p)
    finally:
        del at.SPLIT_CACHE[("TPU vY", 4096)]
    data = json.load(open(p))
    assert data["__toolchain__"] == at._toolchain_stamp()

    # stale stamp -> ignored
    data["__toolchain__"] = "jax=0.0.0;jaxlib=0.0.0"
    json.dump(data, open(p, "w"))
    at.load_wisdom(p)
    assert ("TPU vY", 4096) not in at.SPLIT_CACHE

    # legacy flat format (no stamp) -> ignored
    json.dump({"split|TPU vY|4096": [64, 64, [4, 4, 4]]}, open(p, "w"))
    at.load_wisdom(p)
    assert ("TPU vY", 4096) not in at.SPLIT_CACHE
