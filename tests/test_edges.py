"""Edge-case sweep: tiny, odd, and degenerate shapes across the
functional API vs numpy/scipy oracles."""

import numpy as np
import pytest

scipy_fft = pytest.importorskip("scipy.fft")

import fft_wgpu_tpu as ftt


def crand(rng, *shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def _rel(got, want):
    got = np.asarray(got, complex)
    want = np.asarray(want, complex)
    d = np.linalg.norm(want.ravel())
    if d == 0:
        return float(np.linalg.norm(got.ravel()))
    return float(np.linalg.norm((got - want).ravel()) / d)


class TestTinyLengths:
    @pytest.mark.parametrize("n", [1, 2, 3, 4, 5, 7, 8, 9, 16, 27])
    def test_fft_ifft(self, n, rng):
        x = crand(rng, n)
        assert _rel(ftt.fft(x), np.fft.fft(x)) < 1e-5
        assert _rel(ftt.ifft(x), np.fft.ifft(x)) < 1e-5

    @pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 9])
    def test_rfft_irfft(self, n, rng):
        x = rng.standard_normal(n).astype(np.float32)
        assert _rel(ftt.rfft(x), np.fft.rfft(x)) < 1e-5
        X = crand(rng, n // 2 + 1)
        assert _rel(ftt.irfft(X, n=n), np.fft.irfft(X, n=n)) < 1e-5

    @pytest.mark.parametrize("n", [2, 3, 5, 8])
    @pytest.mark.parametrize("typ", [1, 2, 3, 4])
    def test_dct_tiny(self, n, typ, rng):
        if typ == 1 and n < 2:
            pytest.skip("DCT-I needs n >= 2")
        x = rng.standard_normal(n).astype(np.float32)
        assert _rel(ftt.dct(x, type=typ), scipy_fft.dct(x, type=typ)) < 1e-4

    @pytest.mark.parametrize("n", [1, 2, 3, 6])
    def test_czt_tiny(self, n, rng):
        x = crand(rng, n)
        assert _rel(ftt.czt(x), np.fft.fft(x)) < 1e-5

    def test_dht_tiny(self, rng):
        for n in (1, 2, 3, 4, 5):
            x = rng.standard_normal(n).astype(np.float32)
            j = np.arange(n)
            cas = (np.cos(2 * np.pi * np.outer(j, j) / n)
                   + np.sin(2 * np.pi * np.outer(j, j) / n))
            assert _rel(ftt.dht(x), x.astype(np.float64) @ cas) < 1e-5


class TestNormsAndArgs:
    @pytest.mark.parametrize("norm", [None, "ortho", "forward", "backward"])
    def test_fft_norms(self, norm, rng):
        x = crand(rng, 3, 50)
        assert _rel(ftt.fft(x, norm=norm),
                    np.fft.fft(x, axis=-1, norm=norm or "backward")) < 1e-5

    @pytest.mark.parametrize("n_arg", [16, 33, 64])
    def test_fft_n_crop_pad(self, n_arg, rng):
        x = crand(rng, 40)
        assert _rel(ftt.fft(x, n=n_arg), np.fft.fft(x, n=n_arg)) < 1e-5

    def test_axis_arg(self, rng):
        x = crand(rng, 12, 18)
        assert _rel(ftt.fft(x, axis=0), np.fft.fft(x, axis=0)) < 1e-5

    def test_fftn_degenerate_axes(self, rng):
        x = crand(rng, 4, 1, 8)
        assert _rel(ftt.fftn(x), np.fft.fftn(x)) < 1e-5

    def test_empty_batch(self, rng):
        x = np.zeros((0, 16), np.complex64)
        got = np.asarray(ftt.fft(x))
        assert got.shape == (0, 16)


class TestPlanEdges:
    def test_plan_n1(self, rng):
        p = ftt.plan(1)
        x = crand(rng, 4, 1)
        assert _rel(p.forward(x), x) < 1e-6

    def test_plan_prime(self, rng):
        p = ftt.plan(97)
        x = crand(rng, 2, 97)
        assert _rel(p.forward(x), np.fft.fft(x, axis=-1)) < 1e-5

    def test_plan_length_mismatch(self):
        p = ftt.plan(64)
        with pytest.raises(ValueError):
            p.forward(np.zeros((2, 65), np.complex64))


class TestAxisValidation:
    """Out-of-range axes must raise, never silently wrap (found by the
    round-3 CPU parity fuzz: `a % ndim` wrapped fftn(axes=(5,)) onto
    axis 2 of a 3-D array and transformed the wrong axis)."""

    def test_fftn_axis_oob(self, rng):
        x = crand(rng, 3, 4, 5)
        with pytest.raises(ValueError):
            ftt.fftn(x, axes=(5,))
        with pytest.raises(ValueError):
            ftt.fftn(x, axes=(-4,))

    def test_fftn_s_longer_than_ndim(self, rng):
        x = crand(rng, 3, 4, 5)
        with pytest.raises(ValueError):
            ftt.fftn(x, s=(1, 2, 3, 4))

    def test_rfftn_axis_oob(self, rng):
        r = rng.standard_normal((3, 4, 5)).astype(np.float32)
        with pytest.raises(ValueError):
            ftt.rfftn(r, axes=(3,))

    def test_dctn_axis_oob(self, rng):
        r = rng.standard_normal((3, 4)).astype(np.float32)
        with pytest.raises(ValueError):
            ftt.dctn(r, axes=(2,))
        with pytest.raises(ValueError):
            ftt.dctn(r, s=(1, 2, 3))

    def test_negative_axes_still_work(self, rng):
        x = crand(rng, 3, 4, 8)
        got = np.asarray(ftt.fftn(x, axes=(-1, -3)))
        assert _rel(got, np.fft.fftn(x, axes=(-1, -3))) < 1e-5
