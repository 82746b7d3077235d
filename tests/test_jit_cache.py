"""Unit tests for utils/jit_cache — the config-keyed executable cache
behind the scipy-parity convenience functions (welch/stft/fftconvolve/
dct/fft entry points).

The module's contract (round 5): repeat calls with the same hashable
config reuse one traced executable; anything that cannot be keyed
soundly (None key, unhashable key parts, array windows, tracer
arguments) must fall back to correct uncached behavior rather than
risk a wrong-cache-hit.  These are the properties the entry-point
keys rely on; the precision-mode flush interaction is pinned
separately in test_precision.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fft_wgpu_tpu.utils import jit_cache as jc


@pytest.fixture(autouse=True)
def _fresh_cache():
    saved = dict(jc._CACHE)
    jc._CACHE.clear()
    yield
    jc._CACHE.clear()
    jc._CACHE.update(saved)


def _fresh_impl(traces, delta=1):
    """A NEW closure object per call, like every real call site (the
    convenience functions rebuild their impl closure on each invocation
    — that per-call closure identity is exactly what defeats jax.jit's
    own identity-keyed cache and what this module exists to bridge)."""
    def impl(x):
        traces.append(1)
        return x + delta
    return impl


def test_same_key_traces_once_across_fresh_closures():
    traces = []
    x = jnp.zeros((4,), jnp.float32)
    a = jc.cached_call(("k1",), _fresh_impl(traces), x)
    b = jc.cached_call(("k1",), _fresh_impl(traces), x)
    assert len(traces) == 1  # second closure never traced: cache hit
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_distinct_keys_trace_separately():
    traces = []
    x = jnp.zeros((4,), jnp.float32)
    jc.cached_call(("k1",), _fresh_impl(traces), x)
    jc.cached_call(("k2",), _fresh_impl(traces), x)
    assert len(traces) == 2
    assert len(jc._CACHE) == 2


def test_none_key_never_caches():
    traces = []
    x = jnp.zeros((4,), jnp.float32)
    jc.cached_call(None, _fresh_impl(traces), x)
    jc.cached_call(None, _fresh_impl(traces), x)
    assert len(traces) == 2  # no reuse across closure objects
    assert not jc._CACHE


def test_unhashable_key_falls_back_uncached():
    # entry points embed e.g. `weights` that may be a numpy array; the
    # cache must degrade to fresh jits, not crash or mis-hit
    traces = []
    x = jnp.zeros((4,), jnp.float32)
    key = ("mt", np.arange(3))
    jc.cached_call(key, _fresh_impl(traces), x)
    out = jc.cached_call(key, _fresh_impl(traces, delta=2), x)
    assert len(traces) == 2
    assert not jc._CACHE
    # the second closure's OWN semantics were used (no stale-key hit)
    np.testing.assert_array_equal(np.asarray(out),
                                  2 * np.ones(4, np.float32))


def test_tracer_args_inline_impl():
    # inside an active trace a cached closure would capture the outer
    # trace's constants (UnexpectedTracerError later) — cached_call must
    # inline instead, and must NOT populate the cache with trace junk
    def impl(v):
        return v * 2

    @jax.jit
    def outer(v):
        return jc.cached_call(("inner",), impl, v)

    out = outer(jnp.ones((4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(out), 2 * np.ones(4, np.float32))
    assert ("inner",) not in jc._CACHE
    # and a later non-traced call still works and caches normally
    out2 = jc.cached_call(("inner",), impl, jnp.ones((4,), jnp.float32))
    np.testing.assert_array_equal(np.asarray(out2),
                                  2 * np.ones(4, np.float32))
    assert ("inner",) in jc._CACHE


def test_growth_guard_clears():
    x = jnp.zeros((2,), jnp.float32)
    for i in range(257):
        jc.cached_jit(("g", i), lambda v: v)
    assert len(jc._CACHE) == 257
    jc.cached_call(("overflow",), lambda v: v, x)
    assert len(jc._CACHE) == 1  # guard wiped, then stored the new entry


def test_window_key_semantics():
    assert jc.window_key(None) is None
    assert jc.window_key("hann") == "hann"
    assert jc.window_key(("kaiser", 8.6)) == ("kaiser", 8.6)
    # array/callable windows cannot be identity-keyed by value: must
    # return None so call sites disable caching (two different arrays of
    # the same shape must never share an executable's baked constants)
    assert jc.window_key(np.hanning(16)) is None
    assert jc.window_key(("kaiser", np.float32(8.6), object())) is None
    assert jc.window_key(len) is None


def test_shape_key_semantics():
    assert jc.shape_key(None) is None
    k = jc.shape_key(jnp.zeros((3, 5), jnp.float32))
    assert k == ((3, 5), "float32")
    assert jc.shape_key(np.zeros((3, 5), np.float64)) == ((3, 5), "float64")
