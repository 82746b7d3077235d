#!/usr/bin/env python
"""Hardware validation sweep: every BASELINE.json config on the local chip.

Run on a TPU host: `python scripts/hw_smoke.py`.  Prints one PASS/FAIL line
per config (rel-L2 vs numpy oracles; device-side metrics for the largest
sizes).  Config 5 (multi-chip pencil) is exercised on the virtual CPU mesh
by tests/test_distributed.py and dry-run by __graft_entry__.dryrun_multichip.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu import device_get_complex as dget

TOL = 1e-5
failures = []


def check(tag, got, want):
    got = np.asarray(got)
    err = np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-30)
    ok = err < TOL
    print(f"{'PASS' if ok else 'FAIL'} {tag}: rel-L2={err:.2e}")
    if not ok:
        failures.append(tag)


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0].device_kind}")

    # config 1: 1D C2C N=1024, single batch, vs naive DFT
    x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
        np.complex64
    )
    check("config1 N=1024 vs naive DFT", dget(ftt.fft(x)), ftt.naive_dft(x))

    # config 2: batched N=4096 (trimmed batch here; bench.py measures perf)
    xb = (rng.standard_normal((256, 4096)) + 1j * rng.standard_normal((256, 4096))).astype(np.complex64)
    check("config2 4096x256 fwd", dget(ftt.fft(xb)), np.fft.fft(xb, axis=-1))
    check("config2 4096x256 inv", dget(ftt.ifft(xb)), np.fft.ifft(xb, axis=-1))

    # config 3: N=2^22 four-step — on-device roundtrip + impulse (host
    # oracle at this size is slow; numpy cross-check at 2^18)
    n = 1 << 22
    re = jax.random.normal(jax.random.PRNGKey(0), (2, n), jnp.float32)
    im = re * 0.5
    from fft_wgpu_tpu.plan.plan import get_plan

    p = get_plan(n, "auto")
    fwd = jax.jit(lambda a, b: p._execute_split(a, b, -1, None))
    inv = jax.jit(lambda a, b: p._execute_split(a, b, +1, 1.0 / n))
    fr, fi = fwd(re, im)
    rr, ri = inv(fr, fi)
    err = float(jnp.sqrt(jnp.sum((rr - re) ** 2 + (ri - im) ** 2) / jnp.sum(re**2 + im**2)))
    print(f"{'PASS' if err < TOL else 'FAIL'} config3 N=2^22 roundtrip: rel-L2={err:.2e}")
    if err >= TOL:
        failures.append("config3")
    x18 = (rng.standard_normal(1 << 18) + 1j * rng.standard_normal(1 << 18)).astype(np.complex64)
    check("config3 N=2^18 vs numpy", dget(ftt.fft(x18)), np.fft.fft(x18))

    # config 4: 2D 4096x4096 + R2C/C2R
    x2 = (rng.standard_normal((512, 4096)) + 1j * rng.standard_normal((512, 4096))).astype(np.complex64)
    check("config4 fft2 512x4096", dget(ftt.fft2(x2)), np.fft.fft2(x2))
    xr = rng.standard_normal((64, 4096)).astype(np.float32)
    check("config4 rfft", dget(ftt.rfft(xr)), np.fft.rfft(xr, axis=-1))
    X = np.fft.rfft(xr, axis=-1).astype(np.complex64)
    check("config4 irfft", ftt.irfft(X, n=4096), np.fft.irfft(X, n=4096, axis=-1))

    # config 5: single-chip stand-in (full pencil path runs on >=2 chips;
    # see tests/test_distributed.py on the 8-device CPU mesh)
    n_dev = len(jax.devices())
    if n_dev >= 2:
        from fft_wgpu_tpu.parallel import mesh, pencil

        x3 = (rng.standard_normal((16, 16, 32)) + 1j * rng.standard_normal((16, 16, 32))).astype(np.complex64)
        check("config5 pencil fft3d", dget(pencil.fft3d(x3, mesh.make_pencil_mesh())), np.fft.fftn(x3))
    else:
        x3 = (rng.standard_normal((32, 32, 64)) + 1j * rng.standard_normal((32, 32, 64))).astype(np.complex64)
        check("config5 (single-chip fftn stand-in)", dget(ftt.fftn(x3)), np.fft.fftn(x3))

    extended()

    print("=" * 40)
    if failures:
        print(f"FAILURES: {failures}")
        sys.exit(1)
    print("ALL CONFIGS PASS")


def extended():
    """Extended sweep over the scipy-surface ops (run after main())."""
    from scipy import fft as sfft

    from fft_wgpu_tpu.ops.stft import istft, stft

    rng = np.random.default_rng(1)
    x = rng.standard_normal((8, 512)).astype(np.float32)
    check("ext dct2", ftt.dct(x), sfft.dct(x, axis=-1))
    check("ext dst3", ftt.dst(x, type=3), sfft.dst(x, type=3, axis=-1))
    sig = rng.standard_normal(4096).astype(np.float32)
    y = np.asarray(istft(stft(sig, n_fft=512), n_fft=512, length=4096))
    err = np.linalg.norm(y - sig) / np.linalg.norm(sig)
    print(f"{'PASS' if err < 1e-4 else 'FAIL'} ext stft roundtrip: {err:.2e}")
    if err >= 1e-4:
        failures.append("stft")
    z = (rng.standard_normal(129) + 1j * rng.standard_normal(129)).astype(np.complex64)
    check("ext hfft", ftt.hfft(z, n=256), np.fft.hfft(z, n=256))


if __name__ == "__main__":
    main()
