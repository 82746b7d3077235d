#!/usr/bin/env python
"""Distributed pencil 3-D FFT scaling report (BASELINE config 5).

No multi-chip hardware is reachable from this environment (single v5e
chip over a tunnel), so this prints (a) the lower-bound cost model for
1024^3 on v5e meshes (utils/roofline.pencil_fft3d_model) and (b) a
correctness check of the actual `fft3d` sharded program on an 8-device
virtual CPU mesh — the same code path that would run over ICI.

Run (CPU-only, safe alongside TPU jobs):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/distributed_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # the axon env presets JAX_PLATFORMS=axon
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")  # env alone loses to the axon plugin

import numpy as np


def model_table():
    from fft_wgpu_tpu.utils.roofline import pencil_fft3d_model

    print("## pencil 3-D C2C cost model, v5e (819 GB/s HBM, 1600 Gbps ICI)")
    print("| cube | mesh | chips | compute floor | ICI floor | overlapped |"
          " model GFLOP/s |")
    print("|---|---|---|---|---|---|---|")
    for n, meshes in [(512, [(2, 2), (4, 2)]),
                      (1024, [(4, 4), (8, 4), (8, 8)]),
                      (2048, [(8, 8), (16, 8)])]:
        for m in meshes:
            r = pencil_fft3d_model(n, m, hbm_bw=0.819e12, ici_bw=2.0e11,
                                   transposed_output=False)
            print(f"| {n}^3 | {m[0]}x{m[1]} | {r['chips']} |"
                  f" {r['compute_s']*1e3:.2f} ms | {r['ici_s']*1e3:.2f} ms |"
                  f" {r['overlapped_s']*1e3:.2f} ms | {r['gflops']:.0f} |")


def correctness():
    import jax
    import jax.numpy as jnp

    from fft_wgpu_tpu.parallel.mesh import make_pencil_mesh
    from fft_wgpu_tpu.parallel.pencil import fft3d, ifft3d

    mesh = make_pencil_mesh(jax.devices()[:8])
    px, py = mesh.devices.shape
    n = 32
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, n, n)).astype(np.float32)
    X = np.asarray(jnp.real(ifft3d(fft3d(jnp.asarray(x), mesh), mesh)))
    rt = np.linalg.norm(X - x) / np.linalg.norm(x)
    ref = np.fft.fftn(x)
    F = np.asarray(fft3d(jnp.asarray(x), mesh))
    rel = np.linalg.norm(F - ref) / np.linalg.norm(ref)
    print(f"\n8-device CPU-mesh ({px}x{py}) validation, {n}^3:"
          f" vs numpy.fftn rel {rel:.2e}, roundtrip {rt:.2e}")


if __name__ == "__main__":
    model_table()
    correctness()
