"""scipy.ndimage fourier_* parity tests."""

import numpy as np
import pytest

ndi = pytest.importorskip("scipy.ndimage")

import fft_wgpu_tpu as ftt


def _rel(got, want):
    got = np.asarray(got, complex)
    want = np.asarray(want, complex)
    return float(np.linalg.norm(got - want) / np.linalg.norm(want))


@pytest.fixture
def img(rng):
    return rng.standard_normal((24, 32)).astype(np.float32)


class TestFullSpectrum:
    def test_gaussian(self, img):
        X = np.fft.fft2(img).astype(np.complex64)
        assert _rel(ftt.fourier_gaussian(X, 2.0),
                    ndi.fourier_gaussian(X, 2.0)) < 1e-5

    def test_gaussian_anisotropic(self, img):
        X = np.fft.fft2(img).astype(np.complex64)
        assert _rel(ftt.fourier_gaussian(X, (1.0, 3.0)),
                    ndi.fourier_gaussian(X, (1.0, 3.0))) < 1e-5

    def test_uniform(self, img):
        X = np.fft.fft2(img).astype(np.complex64)
        assert _rel(ftt.fourier_uniform(X, 5),
                    ndi.fourier_uniform(X, 5)) < 1e-5

    def test_shift(self, img):
        X = np.fft.fft2(img).astype(np.complex64)
        assert _rel(ftt.fourier_shift(X, (1.5, -2.25)),
                    ndi.fourier_shift(X, (1.5, -2.25))) < 1e-5

    @pytest.mark.parametrize("rank", [1, 2, 3])
    def test_ellipsoid(self, rng, rank):
        shape = (16,) * rank
        x = rng.standard_normal(shape).astype(np.float32)
        X = np.fft.fftn(x).astype(np.complex64)
        assert _rel(ftt.fourier_ellipsoid(X, 4.0),
                    ndi.fourier_ellipsoid(X, 4.0)) < 1e-4

    def test_rank4_ellipsoid_rejected(self, rng):
        X = np.zeros((2, 2, 2, 2), np.complex64)
        with pytest.raises(ValueError):
            ftt.fourier_ellipsoid(X, 2.0)


class TestHalfSpectrum:
    def test_gaussian_rfft(self, img):
        X = np.fft.rfft2(img).astype(np.complex64)
        got = ftt.fourier_gaussian(X, 1.5, n=img.shape[-1])
        want = ndi.fourier_gaussian(X, 1.5, n=img.shape[-1])
        assert _rel(got, want) < 1e-5

    def test_shift_rfft_roundtrip(self, img):
        # shift by integer pixels through the R2C path and compare to roll
        X = np.fft.rfft2(img).astype(np.complex64)
        Y = ftt.fourier_shift(X, (3, 5), n=img.shape[-1])
        y = np.fft.irfft2(np.asarray(ftt.device_get_complex(Y)),
                          s=img.shape)
        np.testing.assert_allclose(y, np.roll(img, (3, 5), (0, 1)),
                                   atol=1e-4)


class TestEndToEnd:
    def test_gaussian_blur_smooths_and_preserves_mean(self, rng):
        # scipy's fourier_* are CONTINUOUS-kernel transforms (sinc box,
        # Gaussian), so the oracle is scipy itself (TestFullSpectrum);
        # end-to-end we check the filter acts like a blur: mean (DC)
        # preserved, variance reduced, result real
        x = rng.standard_normal((32, 32)).astype(np.float32) + 2.0
        X = np.fft.fft2(x).astype(np.complex64)
        y = np.fft.ifft2(np.asarray(
            ftt.device_get_complex(ftt.fourier_gaussian(X, 2.0))))
        assert np.abs(y.imag).max() < 1e-4
        assert abs(y.real.mean() - x.mean()) < 1e-4
        assert y.real.var() < 0.3 * x.var()
