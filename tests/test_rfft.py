"""R2C / C2R transforms vs numpy (new capability vs the C2C-only reference)."""

import numpy as np

import jax.numpy as jnp
import pytest

import fft_wgpu_tpu as ftt


@pytest.mark.parametrize("n", [2, 4, 16, 256, 512, 1024, 120])
def test_rfft_matches_numpy(n, rng, assert_close):
    x = rng.standard_normal((4, n)).astype(np.float32)
    assert_close(ftt.rfft(x), np.fft.rfft(x, axis=-1), what=f"(n={n})")


@pytest.mark.parametrize("n", [15, 33])
def test_rfft_odd_fallback(n, rng, assert_close):
    x = rng.standard_normal(n).astype(np.float32)
    assert_close(ftt.rfft(x), np.fft.rfft(x), what=f"(n={n})")


@pytest.mark.parametrize("n", [4, 256, 1024, 120])
def test_irfft_matches_numpy(n, rng, assert_close):
    X = (rng.standard_normal((3, n // 2 + 1)) + 1j * rng.standard_normal((3, n // 2 + 1))).astype(np.complex64)
    assert_close(ftt.irfft(X, n=n), np.fft.irfft(X, n=n, axis=-1), what=f"(n={n})")


def test_rfft_irfft_roundtrip(rng, assert_close):
    x = rng.standard_normal((2, 512)).astype(np.float32)
    assert_close(ftt.irfft(ftt.rfft(x), n=512), x)


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_rfft_norms(norm, rng, assert_close):
    x = rng.standard_normal(256).astype(np.float32)
    assert_close(ftt.rfft(x, norm=norm), np.fft.rfft(x, norm=norm or "backward"))
    X = np.fft.rfft(x)
    assert_close(
        ftt.irfft(X.astype(np.complex64), n=256, norm=norm),
        np.fft.irfft(X, n=256, norm=norm or "backward"),
    )


def test_rfft_axis(rng, assert_close):
    x = rng.standard_normal((8, 64, 3)).astype(np.float32)
    assert_close(ftt.rfft(x, axis=1), np.fft.rfft(x, axis=1))
    X = np.fft.rfft(x, axis=1).astype(np.complex64)
    assert_close(ftt.irfft(X, n=64, axis=1), np.fft.irfft(X, n=64, axis=1))


def test_rfft2_and_rfftn(rng, assert_close):
    x = rng.standard_normal((32, 64)).astype(np.float32)
    assert_close(ftt.rfft2(x), np.fft.rfft2(x))
    assert_close(ftt.irfft2(ftt.rfft2(x), s=(32, 64)), x)
    y = rng.standard_normal((8, 16, 32)).astype(np.float32)
    assert_close(ftt.rfftn(y), np.fft.rfftn(y))
    assert_close(ftt.irfftn(ftt.rfftn(y), s=(8, 16, 32)), y)


def test_rfft_rejects_complex(rng):
    z = (rng.standard_normal(16) + 1j * rng.standard_normal(16)).astype(np.complex64)
    with pytest.raises(TypeError):
        ftt.rfft(z)


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
def test_hfft_ihfft(norm, rng, assert_close):
    n = 256
    X = (rng.standard_normal(n // 2 + 1) + 1j * rng.standard_normal(n // 2 + 1)).astype(np.complex64)
    assert_close(ftt.hfft(X, n=n, norm=norm), np.fft.hfft(X, n=n, norm=norm or "backward"))
    x = rng.standard_normal(n).astype(np.float32)
    assert_close(ftt.ihfft(x, norm=norm), np.fft.ihfft(x, norm=norm or "backward"))


def test_rfft_pallas_kernel_interpret(rng, assert_close):
    """Single-pass Pallas R2C kernel (the TPU fast path) vs numpy."""
    from fft_wgpu_tpu.ops import pallas_fft as pf

    for n, rows in [(1024, 4), (512, 130)]:
        x = rng.standard_normal((rows, n)).astype(np.float32)
        Xr, Xi = pf.rfft_rows_split(jnp.asarray(x), interpret=True)
        got = np.asarray(Xr) + 1j * np.asarray(Xi)
        assert_close(got, np.fft.rfft(x, axis=-1), what=f"pallas r2c n={n}")
    # folded scale (ortho)
    x = rng.standard_normal((8, 1024)).astype(np.float32)
    Xr, Xi = pf.rfft_rows_split(jnp.asarray(x), 1024**-0.5, interpret=True)
    got = np.asarray(Xr) + 1j * np.asarray(Xi)
    assert_close(got, np.fft.rfft(x, axis=-1, norm="ortho"),
                 what="pallas r2c ortho")


def test_irfft_pallas_kernel_interpret(rng, assert_close):
    """Single-pass flip-free Pallas C2R kernel vs numpy."""
    from fft_wgpu_tpu.ops import pallas_fft as pf

    for n, rows in [(256, 4), (1024, 3), (2048, 130)]:
        X = (rng.standard_normal((rows, n // 2 + 1))
             + 1j * rng.standard_normal((rows, n // 2 + 1))
             ).astype(np.complex64)
        out = pf.irfft_rows_split(jnp.asarray(X.real), jnp.asarray(X.imag),
                                  n, 1.0 / n, interpret=True)
        assert_close(np.asarray(out), np.fft.irfft(X, n=n, axis=-1),
                     what=f"pallas c2r n={n}")


def test_r2c_balanced_kernel_interpret(rng, assert_close):
    """Balanced-split R2C kernel (real-specialized VPU stage 1)."""
    from fft_wgpu_tpu.ops import pallas_fft as pf

    # production entries (2048 is in _BALANCED_R2C) plus an injected small
    # n to keep interpret-mode cheap while covering the routing machinery
    x = rng.standard_normal((12, 2048)).astype(np.float32)
    Xr, Xi = pf.rfft_rows_split(jnp.asarray(x), interpret=True)
    got = np.asarray(Xr) + 1j * np.asarray(Xi)
    assert_close(got, np.fft.rfft(x, axis=-1), what="balanced r2c n=2048")

    # NOTE: 512 IS a production _BALANCED_R2C entry — the old
    # inject-then-del here REMOVED it for the rest of the session,
    # breaking any later nfft=512 fused-kernel test that ran after this
    # file (masked for months by alphabetical collection order).
    saved = pf._BALANCED_R2C.get(512)
    pf._BALANCED_R2C[512] = (16, 32, (4, 4))
    try:
        x = rng.standard_normal((130, 512)).astype(np.float32)
        Xr, Xi = pf.rfft_rows_split(jnp.asarray(x), 512**-0.5,
                                    interpret=True)
        got = np.asarray(Xr) + 1j * np.asarray(Xi)
        assert_close(got, np.fft.rfft(x, axis=-1, norm="ortho"),
                     what="balanced r2c n=512 ortho")
    finally:
        if saved is None:
            pf._BALANCED_R2C.pop(512, None)
        else:
            pf._BALANCED_R2C[512] = saved


def test_c2r_balanced_kernel_interpret(rng, assert_close):
    """Balanced-split C2R kernel (sublane-flip Hermitian extension)."""
    from fft_wgpu_tpu.ops import pallas_fft as pf

    for n, spec, rows in [(512, (16, 32), 130), (1024, (32, 32), 4)]:
        saved = pf._BALANCED_C2R.get(n)  # 512/1024 ARE production
        pf._BALANCED_C2R[n] = spec       # entries: restore, never del
        try:
            X = (rng.standard_normal((rows, n // 2 + 1))
                 + 1j * rng.standard_normal((rows, n // 2 + 1))
                 ).astype(np.complex64)
            out = pf.irfft_rows_split(jnp.asarray(X.real),
                                      jnp.asarray(X.imag),
                                      n, 1.0 / n, interpret=True)
            assert_close(np.asarray(out), np.fft.irfft(X, n=n, axis=-1),
                         what=f"balanced c2r n={n}")
        finally:
            if saved is None:
                pf._BALANCED_C2R.pop(n, None)
            else:
                pf._BALANCED_C2R[n] = saved


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("shape,s,axes", [
    ((3, 9), None, None),        # default: last axis Hermitian, n=2*(9-1)
    ((4, 5), (4, 11), None),     # odd output length
    ((6, 3, 5), None, (0, 2)),   # explicit axes, Hermitian on axis 2
    ((5, 4), (8,), (0,)),        # single Hermitian axis only
])
def test_hfftn_matches_scipy(shape, s, axes, norm, rng, assert_close):
    import scipy.fft as sf

    X = (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(np.complex64)
    want = sf.hfftn(X.copy(), s=s, axes=axes, norm=norm)
    assert_close(ftt.hfftn(X, s=s, axes=axes, norm=norm), want,
                 what=f"(shape={shape}, s={s}, axes={axes}, norm={norm})")


@pytest.mark.parametrize("norm", [None, "ortho", "forward"])
@pytest.mark.parametrize("shape,s,axes", [
    ((3, 16), None, None),
    ((4, 3, 10), None, (0, 2)),
    ((5, 12), (4, 8), None),
])
def test_ihfftn_matches_scipy(shape, s, axes, norm, rng, assert_close):
    import scipy.fft as sf

    x = rng.standard_normal(shape).astype(np.float32)
    want = sf.ihfftn(x, s=s, axes=axes, norm=norm).astype(np.complex64)
    assert_close(ftt.ihfftn(x, s=s, axes=axes, norm=norm), want,
                 what=f"(shape={shape}, s={s}, axes={axes}, norm={norm})")


def test_hfft2_roundtrip(rng, assert_close):
    import scipy.fft as sf

    x = rng.standard_normal((6, 10)).astype(np.float32)
    Z = ftt.ihfft2(x)
    assert_close(Z, sf.ihfft2(x).astype(np.complex64))
    assert_close(ftt.hfft2(np.asarray(ftt.device_get_complex(Z)), s=x.shape), x)
