"""fft_wgpu_tpu — a TPU-native FFT framework.

Built from scratch in JAX/Pallas with the capabilities of the `fft_wgpu`
reference (Rust/wgpu batched Stockham FFT; see SURVEY.md), redesigned
TPU-first: DFT-by-matmul base kernels on the MXU, fused VMEM-resident Pallas
executors, a plan-based scheduler, four-step decomposition beyond VMEM, and
sharded multi-chip transforms via `shard_map` + all-to-all over ICI.
"""

from .core.reference import naive_dft, naive_idft
from .ops.cepstrum import (
    complex_cepstrum,
    inverse_complex_cepstrum,
    minimum_phase,
    real_cepstrum,
)
from .ops.channelizer import channelize, prototype_lowpass
from .ops.chebyshev import (
    cheb_coeffs,
    cheb_derivative,
    cheb_integrate,
    cheb_points,
    cheb_values,
    clenshaw_curtis_weights,
)
from .ops.cwt import cwt, morlet2, ricker
from .ops.structured import (
    circulant_matvec,
    circulant_solve,
    grf_sample,
    toeplitz_matvec,
    toeplitz_solve,
)
from .ops.czt import CZT, ZoomFFT, czt, czt_points, zoom_fft
from .ops.dct import dct, dctn, dst, dstn, idct, idctn, idst, idstn
from .ops.helpers import (
    dht,
    idht,
    fft_convolve,
    fftconvolve,
    fftcorrelate,
    hilbert,
    hilbert2,
    resample,
    fftfreq,
    fftshift,
    ifftshift,
    next_fast_len,
    prev_fast_len,
    get_workers,
    set_workers,
    oaconvolve,
    rfftfreq,
)
from .ops.fftlog import fht, fhtoffset, ifht
from .ops.frft import frft, frft2
from .ops.nd import fft2, fftn, ifft2, ifftn
from .ops.mdct import imdct, imdct_frame, mdct, mdct_frame, sine_window
from .ops.nufft import (
    nufft1d1,
    nufft1d2,
    nufft1d3,
    nufft2d3,
    nufft3d3,
    nufft2d1,
    nufft2d2,
    nufft3d1,
    nufft3d2,
)
from .ops.rfft import (
    hfft,
    hfft2,
    hfftn,
    ihfft,
    ihfft2,
    ihfftn,
    irfft,
    irfft2,
    irfftn,
    rfft,
    rfft2,
    rfftn,
)
from .ops.spectral import spectral_derivative, spectral_gradient, spectral_laplacian
from .ops.spectral_est import (
    coherence,
    csd,
    dpss,
    flattop_window,
    get_window,
    kaiser_window,
    multitaper,
    periodogram,
    spectrogram,
    tukey_window,
    welch,
)
from .ops.short_time_fft import ShortTimeFFT
from .ops.stft import bartlett_window, blackman_window, hamming_window, hann_window, istft, stft
from .ops.transforms import fft, ifft, ifft_unnormalized, normalize
from .ops.wigner import wigner_ville, wigner_ville_frequencies
from .plan.aot import AOTPlan, export_plan, load_plan
from .plan.parity import Forward, Inverse, Normalize, Onlyinverse
from .plan.plan import Plan, plan
from .utils.io import device_get_complex, device_put_complex

__version__ = "0.1.0"

__all__ = [
    "fft",
    "ifft",
    "fft2",
    "ifft2",
    "fftn",
    "ifftn",
    "rfft",
    "irfft",
    "rfft2",
    "irfft2",
    "rfftn",
    "irfftn",
    "hfft",
    "hfft2",
    "hfftn",
    "ihfft",
    "ihfft2",
    "ihfftn",
    "fftshift",
    "ifftshift",
    "fftfreq",
    "rfftfreq",
    "fft_convolve",
    "fftconvolve",
    "fftcorrelate",
    "hilbert",
    "hilbert2",
    "resample",
    "next_fast_len",
    "prev_fast_len",
    "get_workers",
    "set_workers",
    "oaconvolve",
    "dct",
    "idct",
    "dst",
    "idst",
    "dctn",
    "idctn",
    "dstn",
    "idstn",
    "czt",
    "channelize",
    "prototype_lowpass",
    "real_cepstrum",
    "complex_cepstrum",
    "inverse_complex_cepstrum",
    "minimum_phase",
    "cwt",
    "ricker",
    "morlet2",
    "circulant_matvec",
    "circulant_solve",
    "toeplitz_matvec",
    "toeplitz_solve",
    "grf_sample",
    "mdct",
    "imdct",
    "mdct_frame",
    "imdct_frame",
    "sine_window",
    "nufft1d1",
    "nufft1d2",
    "nufft1d3",
    "nufft2d1",
    "nufft2d2",
    "nufft3d1",
    "nufft3d2",
    "nufft2d3",
    "nufft3d3",
    "zoom_fft",
    "fht",
    "ifht",
    "fhtoffset",
    "spectral_derivative",
    "spectral_gradient",
    "spectral_laplacian",
    "stft",
    "istft",
    "periodogram",
    "welch",
    "csd",
    "coherence",
    "spectrogram",
    "get_window",
    "tukey_window",
    "hann_window",
    "hamming_window",
    "blackman_window",
    "bartlett_window",
    "ifft_unnormalized",
    "normalize",
    "plan",
    "Plan",
    "export_plan",
    "load_plan",
    "AOTPlan",
    "Forward",
    "Inverse",
    "Onlyinverse",
    "Normalize",
    "naive_dft",
    "naive_idft",
    "device_get_complex",
    "device_put_complex",
    "__version__",
]
