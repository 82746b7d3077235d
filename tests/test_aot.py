"""AOT serving artifacts: export -> load -> replay without tracing."""

import numpy as np
import pytest

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu.plan.aot import export_plan, load_plan


def _rand_split(rng, shape):
    return (rng.standard_normal(shape).astype(np.float32),
            rng.standard_normal(shape).astype(np.float32))


def test_roundtrip_bytes(rng, assert_close):
    n, b = 128, 8
    p = ftt.plan(n)
    art = export_plan(p, batch_shape=(b,))
    assert isinstance(art, bytes)
    sp = load_plan(art)
    assert sp.n == n and sp.shape == (b, n)

    re, im = _rand_split(rng, (b, n))
    fr, fi = sp.forward_split(re, im)
    want = np.fft.fft(re + 1j * im, axis=-1)
    assert_close(np.asarray(fr) + 1j * np.asarray(fi), want, 1e-5)

    br, bi = sp.inverse_split(np.asarray(fr), np.asarray(fi))
    assert_close(np.asarray(br) + 1j * np.asarray(bi), re + 1j * im, 1e-5)

    ur, ui = sp.inverse_unnormalized_split(np.asarray(fr), np.asarray(fi))
    assert_close(np.asarray(ur) + 1j * np.asarray(ui),
                 (re + 1j * im) * n, 1e-5)


def test_roundtrip_file(rng, assert_close, tmp_path):
    n = 64
    p = ftt.plan(n)
    path = tmp_path / "p64.ftta"
    out = export_plan(p, str(path), batch_shape=(4,))
    assert out == str(path)
    sp = load_plan(str(path))
    re, im = _rand_split(rng, (4, n))
    fr, fi = sp.forward_split(re, im)
    want = np.fft.fft(re + 1j * im, axis=-1)
    assert_close(np.asarray(fr) + 1j * np.asarray(fi), want, 1e-5)


def test_shape_and_op_validation(rng):
    p = ftt.plan(32)
    sp = load_plan(export_plan(p, batch_shape=(2,), ops=("forward",)))
    re, im = _rand_split(rng, (2, 32))
    with pytest.raises(ValueError, match="exported without"):
        sp.inverse_split(re, im)
    with pytest.raises(ValueError, match="serves shape"):
        sp.forward_split(re[:1], im[:1])
    with pytest.raises(ValueError, match="unknown op"):
        export_plan(p, batch_shape=(2,), ops=("nosuch",))


def test_not_an_artifact(tmp_path):
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("meta.json", "{\"format\": \"other\"}")
    with pytest.raises(ValueError, match="artifact"):
        load_plan(buf.getvalue())


def test_non_pow2_and_axis0(rng, assert_close):
    """Bluestein lengths and non-minor axes export too."""
    n = 12
    p = ftt.plan(n)
    sp = load_plan(export_plan(p, batch_shape=(5,)))
    re, im = _rand_split(rng, (5, n))
    fr, fi = sp.forward_split(re, im)
    want = np.fft.fft(re + 1j * im, axis=-1)
    assert_close(np.asarray(fr) + 1j * np.asarray(fi), want, 1e-5)

    p2 = ftt.plan(16)
    sp2 = load_plan(export_plan(p2, batch_shape=(), axis=0))
    # axis=0 on a 1-D input: shape (16,)
    re2, im2 = _rand_split(rng, (16,))
    fr2, fi2 = sp2.forward_split(re2, im2)
    want2 = np.fft.fft(re2 + 1j * im2)
    assert_close(np.asarray(fr2) + 1j * np.asarray(fi2), want2, 1e-5)
