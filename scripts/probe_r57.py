#!/usr/bin/env python
"""Round-3 probe T: isolate the ragged-row-block fault. All hardware
tests used 128-aligned batch rows; rows=300 (ragged last grid block)
crashed the TPU worker even after the pipe-routing guard, so the PLAIN
balanced kernels are suspect on ragged edges too.  Ladder: aligned
forms first, each ragged case last-of-its-process-section so the crash
point is unambiguous.

Run: nohup setsid python scripts/probe_r57.py <case> ...
cases: r2c384 r2c300 c2c300 c2r300
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)
    n = 512

    def check(tag, rows, kind):
        signal.alarm(600)
        try:
            x = rng.standard_normal((rows, n)).astype(np.float32)
            if kind == "r2c":
                r, i = jax.jit(
                    lambda v: pf.rfft_rows_split(v, None))(jnp.asarray(x))
                got = np.asarray(r) + 1j * np.asarray(i)
                want = np.fft.rfft(x, axis=-1)
            elif kind == "c2c":
                y = rng.standard_normal((rows, n)).astype(np.float32)
                r, i = jax.jit(lambda a, b: pf.fft_batched_split(
                    a, b, -1, None))(jnp.asarray(x), jnp.asarray(y))
                got = np.asarray(r) + 1j * np.asarray(i)
                want = np.fft.fft(x + 1j * y, axis=-1)
            else:  # c2r
                X = np.fft.rfft(x, axis=-1)
                got = np.asarray(jax.jit(lambda a, b: pf.irfft_rows_split(
                    a, b, n, 1.0 / n))(jnp.asarray(X.real.astype(np.float32)),
                                       jnp.asarray(X.imag.astype(np.float32))))
                want = x
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            signal.alarm(0)
            print(f"{tag}: OK rel={rel:.2e}", flush=True)
            return True
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return False

    cases = {
        "r2c384": ("r2c rows=384 aligned", 384, "r2c"),
        "r2c300": ("r2c rows=300 RAGGED", 300, "r2c"),
        "c2c300": ("c2c rows=300 RAGGED", 300, "c2c"),
        "c2r300": ("c2r rows=300 RAGGED", 300, "c2r"),
    }
    for name in sys.argv[1:]:
        tag, rows, kind = cases[name]
        if not check(tag, rows, kind):
            print("STOP (process poisoned)", flush=True)
            return
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
