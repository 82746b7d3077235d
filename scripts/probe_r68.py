#!/usr/bin/env python
"""Round-5 probe: close-or-floor the R2C/C2R numpy-parity forms
(VERDICT r4 item 5).

The public numpy-shape rows sit at ~25% of roofline vs the padded
serving forms' 37-38%.  Candidates at 4096 x 4096:
  A. current: ragged-direct kernel (writes [.., 2049] straight)
  B. padded kernel + XLA slice to 2049 (extra pass over the spectrum,
     but every kernel write stays 128-aligned)
  C. exact-IO copy floor for the ragged shape (read [b,4096], write
     2x [b,2049] with zero math) — if C ~= A, the ragged row is AT its
     own DMA floor and the row is CLOSED as data.
Same three for C2R (ragged reads).
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache


def main():
    enable_persistent_compilation_cache()
    from fft_wgpu_tpu.ops.rfft import irfft_last_split, rfft_last_split
    from fft_wgpu_tpu.ops.pallas_fft import pad_bins

    n, b = 4096, 4096
    nb, npad = n // 2 + 1, pad_bins(n)
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)

    # --- R2C ---
    A = jax.jit(lambda v: rfft_last_split(v, None))
    Bp = jax.jit(lambda v: tuple(
        a[:, :nb] for a in rfft_last_split(v, None, pad_out=True)))
    tA = _device_time(A, (x,))
    tB = _device_time(Bp, (x,))
    ra = A(x)
    rb = Bp(x)
    err = float(jnp.linalg.norm(ra[0] - rb[0]) + jnp.linalg.norm(ra[1] - rb[1]))
    print(f"R2C ragged-direct {tA*1e3:.3f} ms | padded+slice {tB*1e3:.3f} "
          f"ms | diff {err:.2e}", flush=True)

    # --- C2R ---
    Xr = jax.random.normal(jax.random.PRNGKey(1), (b, nb), jnp.float32)
    Xi = jax.random.normal(jax.random.PRNGKey(2), (b, nb), jnp.float32)
    C = jax.jit(lambda a, c: (irfft_last_split(a, c, n, 1.0 / n),))
    pad = ((0, 0), (0, npad - nb))
    D = jax.jit(lambda a, c: (irfft_last_split(
        jnp.pad(a, pad), jnp.pad(c, pad), n, 1.0 / n, padded_in=True),))
    tC = _device_time(C, (Xr, Xi))
    tD = _device_time(D, (Xr, Xi))
    err = float(jnp.linalg.norm(C(Xr, Xi)[0] - D(Xr, Xi)[0]))
    print(f"C2R ragged-direct {tC*1e3:.3f} ms | pad+padded-in "
          f"{tD*1e3:.3f} ms | diff {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
