"""torch <-> jax interop (utils/interop.py): boundary discipline + fft
equivalence vs torch.fft."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import fft_wgpu_tpu as ftt  # noqa: E402


def test_real_roundtrip(rng):
    t = torch.from_numpy(rng.standard_normal((4, 64)).astype(np.float32))
    a = ftt.from_torch(t)
    assert a.shape == (4, 64) and str(a.dtype) == "float32"
    back = ftt.to_torch(a)
    assert torch.equal(back, t)


def test_complex_roundtrip_and_fft_matches_torch(rng):
    z = (rng.standard_normal((8, 128))
         + 1j * rng.standard_normal((8, 128))).astype(np.complex64)
    t = torch.from_numpy(z)
    a = ftt.from_torch(t)  # planar staging under the hood
    assert np.iscomplexobj(np.asarray(ftt.device_get_complex(a)))
    back = ftt.to_torch(a)
    np.testing.assert_array_equal(back.numpy(), z)
    # torch.fft parity through the framework's plan path
    ours = ftt.device_get_complex(ftt.fft(a))
    want = torch.fft.fft(t).numpy()
    rel = np.linalg.norm(ours - want) / np.linalg.norm(want)
    assert rel < 1e-5, rel


def test_from_torch_grad_detach_and_noncontig(rng):
    t = torch.from_numpy(
        rng.standard_normal((16, 16)).astype(np.float32)).requires_grad_()
    a = ftt.from_torch(t[:, ::2])  # non-contiguous view + grad tensor
    np.testing.assert_allclose(np.asarray(a),
                               t.detach().numpy()[:, ::2])
    with pytest.raises(TypeError):
        ftt.from_torch(np.zeros(3))
