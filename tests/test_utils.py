"""Aux subsystems: validation harness, roofline math, profiling stats."""

import numpy as np
import pytest

from fft_wgpu_tpu.utils import debug, profiling, roofline


def test_validate_kernel():
    err = debug.validate_kernel(512, batch=2)
    assert err < 1e-5
    err = debug.validate_kernel(1024, batch=2, sign=+1)
    assert err < 1e-5


def test_check_finite():
    import jax.numpy as jnp
    from jax.experimental import checkify

    f = checkify.checkify(lambda r, i: debug.check_finite(r, i, "unit"))
    err, _ = f(jnp.ones(4), jnp.ones(4))
    err.throw()  # no error
    err, _ = f(jnp.array([1.0, jnp.nan]), jnp.ones(2))
    with pytest.raises(Exception):
        err.throw()


def test_roofline_math():
    r = roofline.roofline(4096, 4096, seconds=1.0)
    assert r["roofline_gflops"] > 0
    assert abs(roofline.fft_flops(1024) - 5 * 1024 * 10) < 1e-6


def test_op_stats():
    s = profiling.op_stats(4096, 4096, 0.001)
    assert s["gflops"] > 0 and 0 < s["roofline_fraction"]
    assert s["flops_per_element"] == 5 * 12
