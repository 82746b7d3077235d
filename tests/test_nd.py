"""2-D / N-D transforms vs numpy (BASELINE.json config 4 semantics)."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt


def crand(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def test_fft2_matches_numpy(rng, assert_close):
    x = crand(rng, 64, 128)
    assert_close(ftt.fft2(x), np.fft.fft2(x))
    assert_close(ftt.ifft2(x), np.fft.ifft2(x))


def test_fft2_batched_and_axes(rng, assert_close):
    x = crand(rng, 3, 32, 64)
    assert_close(ftt.fft2(x), np.fft.fft2(x))  # default last two axes
    assert_close(ftt.fft2(x, axes=(0, 2)), np.fft.fft2(x, axes=(0, 2)))


def test_fftn_3d(rng, assert_close):
    x = crand(rng, 16, 32, 64)
    assert_close(ftt.fftn(x), np.fft.fftn(x))
    assert_close(ftt.ifftn(x), np.fft.ifftn(x))


def test_fftn_roundtrip(rng, assert_close):
    x = crand(rng, 8, 16, 32)
    assert_close(ftt.ifftn(ftt.fftn(x)), x)


def test_fftn_s_param(rng, assert_close):
    x = crand(rng, 30, 50)
    assert_close(ftt.fftn(x, s=(32, 64)), np.fft.fftn(x, s=(32, 64)))
    assert_close(ftt.fftn(x, s=(16, 32)), np.fft.fftn(x, s=(16, 32)))


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_fftn_norms(norm, rng, assert_close):
    x = crand(rng, 16, 16)
    assert_close(ftt.fftn(x, norm=norm), np.fft.fftn(x, norm=norm or "backward"))
    assert_close(ftt.ifftn(x, norm=norm), np.fft.ifftn(x, norm=norm or "backward"))


def test_fft2_4096_shape_smoke(rng, assert_close):
    # config-4 shape (trimmed rows for CPU test speed): 2D row-column path
    x = crand(rng, 64, 4096)
    assert_close(ftt.fft2(x), np.fft.fft2(x))
