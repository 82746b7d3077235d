#!/usr/bin/env python
"""Interpret-mode (CPU) numerics check for every probe_r34 schedule, so
the hardware probe only measures.  Run: JAX_PLATFORMS=cpu via PYTHONPATH
(tests/conftest-style pinning) or plain pytest environment."""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    rng = np.random.default_rng(0)
    base = pf._dit_schedule
    cases = [
        (4096, [(4, 8, 4, 8, 4), (8, 8, 8, 8), (4, 4, 4, 4, 4, 4),
                (4, 8, 8, 16), (4, 8, 4, 32)]),
        (8192, [(8, 8, 4, 8, 4), (4, 8, 4, 8, 8), (8, 8, 8, 16)]),
    ]
    bad = 0
    for n, schedules in cases:
        re = rng.standard_normal((4, n)).astype(np.float32)
        im = rng.standard_normal((4, n)).astype(np.float32)
        oracle = np.fft.fft(re + 1j * im)
        for sched in schedules:
            pf._dit_schedule = lambda S, _s=sched, _n=n: (
                _s if S == _n else base(S))
            try:
                got = pf.fft_batched_split(
                    jax.numpy.asarray(re), jax.numpy.asarray(im), -1,
                    schedule="dit", interpret=True)
                g = np.asarray(got[0]) + 1j * np.asarray(got[1])
                rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
                status = "ok" if rel < 5e-6 else "WRONG"
                bad += status != "ok"
                print(f"dit {n} {sched}: {status} rel={rel:.1e}", flush=True)
            except Exception as e:
                bad += 1
                print(f"dit {n} {sched}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            finally:
                pf._dit_schedule = base
    print("vcheck_r34_interp:", "ALL OK" if bad == 0 else f"{bad} BAD",
          flush=True)


if __name__ == "__main__":
    main()
