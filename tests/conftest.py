"""Test configuration.

Correctness tests run on CPU with 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware (the fake-backend
mechanism the reference lacks — SURVEY §4).  Must run before jax is
imported anywhere in the test process.
"""

import os

# FFT_WGPU_TPU_HW=1 switches to the hardware tier: the real TPU backend,
# running ONLY the `-m tpu` tests (everything else auto-skips because it
# expects the 8-device virtual CPU mesh).  Usage:
#   FFT_WGPU_TPU_HW=1 python -m pytest tests/ -m tpu -q
_HW_TIER = os.environ.get("FFT_WGPU_TPU_HW") == "1"

if not _HW_TIER:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# jax may already be imported by the interpreter environment; the backend is
# initialized lazily, so forcing the platform via config still works as long
# as no device has been touched yet.
import jax  # noqa: E402

if not _HW_TIER:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert jax.device_count() == 8, "tests expect 8 virtual CPU devices"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    if _HW_TIER:
        skip = pytest.mark.skip(reason="CPU-mesh test (hardware tier active)")
        for item in items:
            if "tpu" not in item.keywords:
                item.add_marker(skip)
    else:
        skip = pytest.mark.skip(
            reason="hardware test: run with FFT_WGPU_TPU_HW=1 -m tpu")
        for item in items:
            if "tpu" in item.keywords:
                item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def rel_l2(got, want) -> float:
    got = np.asarray(got, dtype=np.complex128)
    want = np.asarray(want, dtype=np.complex128)
    denom = np.linalg.norm(want.ravel())
    if denom == 0:
        return float(np.linalg.norm(got.ravel()))
    return float(np.linalg.norm((got - want).ravel()) / denom)


@pytest.fixture
def assert_close():
    def check(got, want, tol=1e-5, what=""):
        err = rel_l2(got, want)
        assert err < tol, f"relative L2 error {err:.3e} >= {tol:.1e} {what}"

    return check
