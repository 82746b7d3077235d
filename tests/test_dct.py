"""DCT/DST (types 1-4) vs the scipy.fft oracle."""

import numpy as np
import pytest

scipy_fft = pytest.importorskip("scipy.fft")

import fft_wgpu_tpu as ftt


@pytest.mark.parametrize("n", [8, 64, 100, 512])
@pytest.mark.parametrize("t", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_matches_scipy(n, t, norm, rng, assert_close):
    x = rng.standard_normal((3, n)).astype(np.float32)
    assert_close(ftt.dct(x, type=t, norm=norm), scipy_fft.dct(x, type=t, norm=norm, axis=-1))
    assert_close(ftt.idct(x, type=t, norm=norm), scipy_fft.idct(x, type=t, norm=norm, axis=-1))


@pytest.mark.parametrize("t", [1, 2, 3, 4])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dst_matches_scipy(t, norm, rng, assert_close):
    x = rng.standard_normal((2, 256)).astype(np.float32)
    assert_close(ftt.dst(x, type=t, norm=norm), scipy_fft.dst(x, type=t, norm=norm, axis=-1))
    assert_close(ftt.idst(x, type=t, norm=norm), scipy_fft.idst(x, type=t, norm=norm, axis=-1))


def test_dct_roundtrip_and_axis(rng, assert_close):
    x = rng.standard_normal((4, 128, 3)).astype(np.float32)
    assert_close(ftt.idct(ftt.dct(x, axis=1), axis=1), x)
    assert_close(
        ftt.dct(x, axis=1, norm="ortho"),
        scipy_fft.dct(x, axis=1, norm="ortho"),
    )


def test_unsupported_types_raise():
    with pytest.raises(NotImplementedError):
        ftt.dct(np.zeros(8, np.float32), type=5)


@pytest.mark.parametrize("t", [1, 4])
def test_dct_dst_new_types_roundtrip(t, rng, assert_close):
    x = rng.standard_normal((2, 96)).astype(np.float32)
    assert_close(ftt.idct(ftt.dct(x, type=t), type=t), x)
    assert_close(ftt.idst(ftt.dst(x, type=t), type=t), x)
    assert_close(ftt.idct(ftt.dct(x, type=t, norm="ortho"), type=t, norm="ortho"), x)


def test_dctn_dstn_vs_scipy(rng, assert_close):
    from scipy import fft as sfft

    x = rng.standard_normal((8, 16, 12)).astype(np.float32)
    for type in (1, 2, 3, 4):
        got = ftt.dctn(x, type=type, axes=(1, 2), norm="ortho")
        assert_close(np.asarray(got),
                     sfft.dctn(x, type=type, axes=(1, 2), norm="ortho"),
                     what=f"dctn type {type}")
        got = ftt.dstn(x, type=type, axes=(0, 2))
        assert_close(np.asarray(got), sfft.dstn(x, type=type, axes=(0, 2)),
                     what=f"dstn type {type}")
    # roundtrips
    assert_close(np.asarray(ftt.idctn(ftt.dctn(x), norm=None)), x,
                 what="dctn roundtrip")
    assert_close(np.asarray(ftt.idstn(ftt.dstn(x, norm="ortho"),
                                      norm="ortho")), x,
                 what="dstn ortho roundtrip")


def test_dctn_s_resize(rng, assert_close):
    from scipy import fft as sfft

    x = rng.standard_normal((6, 10)).astype(np.float32)
    got = ftt.dctn(x, s=(8, 8), axes=(0, 1), norm="ortho")
    assert_close(np.asarray(got), sfft.dctn(x, s=(8, 8), axes=(0, 1),
                                            norm="ortho"), what="dctn s=")


def test_dct_dst_forward_backward_norms(rng):
    """norm='forward'/'backward' (scipy strings) across every type and
    inverse — the round-3 parity fuzz found 'forward' was silently
    treated as backward."""
    import scipy.fft as sfft

    import fft_wgpu_tpu as ftt

    r = rng.standard_normal((3, 32)).astype(np.float32)
    r64 = r.astype(np.float64)
    for norm in ("backward", "forward"):
        for t in (1, 2, 3, 4):
            for ours, ref in ((ftt.dct, sfft.dct), (ftt.idct, sfft.idct),
                              (ftt.dst, sfft.dst), (ftt.idst, sfft.idst)):
                got = np.asarray(ours(r, type=t, norm=norm))
                want = ref(r64, type=t, norm=norm)
                rel = np.linalg.norm(got - want) / np.linalg.norm(want)
                assert rel < 3e-5, (ours.__name__, t, norm, rel)
            back = np.asarray(ftt.idct(
                np.asarray(ftt.dct(r, type=t, norm=norm)),
                type=t, norm=norm))
            assert np.linalg.norm(back - r) / np.linalg.norm(r) < 3e-5
    with pytest.raises(ValueError):
        ftt.dct(r, norm="bogus")
