#!/usr/bin/env python
"""Probe: balanced-split R2C rows kernel (real-specialized VPU stage 1)
vs the classic lane-split _kernel_r2c, at 4096x4096 and 8192x2048 rows.

Run: nohup setsid python scripts/probe_r19.py > /tmp/probe_r19.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    for rows, n, spec in [
        (4096, 4096, (64, 64, (4, 4, 4))),
        (2048, 8192, (64, 128, (4, 4, 4))),
        (4096, 2048, (64, 32, (4, 4, 4))),
    ]:
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        ref = np.fft.rfft(np.asarray(x), axis=-1)
        nref = float(np.sqrt((ref.real ** 2 + ref.imag ** 2).sum()))

        fc = jax.jit(lambda a: pf._rfft_rows_core(a))
        rc, ic = fc(x)
        rc.block_until_ready()
        tc = _device_time(fc, (x,))
        relc = float(np.sqrt(((np.asarray(rc) - ref.real) ** 2
                              + (np.asarray(ic) - ref.imag) ** 2).sum())) / nref
        print(f"r2c {rows}x{n} classic: {tc*1e3:.3f} ms (rel {relc:.2e})",
              flush=True)

        pf._BALANCED_R2C[n] = spec
        try:
            fb = jax.jit(lambda a: pf._rfft_rows_core(a))
            t0 = time.time()
            rb, ib = fb(x)
            rb.block_until_ready()
            comp = time.time() - t0
            relb = float(np.sqrt(((np.asarray(rb) - ref.real) ** 2
                                  + (np.asarray(ib) - ref.imag) ** 2).sum())) / nref
            tb = _device_time(fb, (x,))
            print(f"r2c {rows}x{n} bal {spec}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {relb:.2e})", flush=True)
        except Exception as e:
            print(f"r2c {rows}x{n} bal {spec}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            del pf._BALANCED_R2C[n]


if __name__ == "__main__":
    main()
