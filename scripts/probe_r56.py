#!/usr/bin/env python
"""Round-3 probe S: (A) ragged-batch regression for the pipe-kernel
routing guard (the verify-run irfft rows=300 TPU fault), then (B) a
clean SAME-SHAPE C2C vs R2C vs C2R sweep for VERDICT r3 item 2's "no
real-transform size slower than its C2C sibling" clause — the round-2
numbers compared different batch sizes (rfft 8192 x 2048 vs C2C
8192 x 1024), which is not the clause's comparison.

Run: nohup setsid python scripts/probe_r56.py > /tmp/probe_r56.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    def rel2(a, b):
        return float(jax.jit(lambda a, b: jnp.sqrt(
            jnp.sum(jnp.abs(a - b) ** 2) / jnp.sum(jnp.abs(b) ** 2)))(a, b))

    # ---- A. ragged-batch regression (the rows=300 verify fault) ----
    # Exercises the guard: rows=300 must route to the plain balanced
    # kernels (full-ref stores ride the masked edge), rows=512 keeps the
    # pipe form.  Oracle-checked on device against numpy via CPU upload.
    import fft_wgpu_tpu as ftt
    rng = np.random.default_rng(0)
    for rows in (300, 512):
        n = 512
        signal.alarm(900)
        try:
            x = rng.standard_normal((rows, n)).astype(np.float32)
            X = ftt.device_get_complex(ftt.rfft(x))
            want = np.fft.rfft(x, axis=-1)
            r1 = np.linalg.norm(X - want) / np.linalg.norm(want)
            back = np.asarray(ftt.irfft(ftt.device_put_complex(want), n))
            r2 = np.linalg.norm(back - x) / np.linalg.norm(x)
            z = (rng.standard_normal((rows, n))
                 + 1j * rng.standard_normal((rows, n))).astype(np.complex64)
            Z = ftt.device_get_complex(ftt.fft(z))
            r3 = (np.linalg.norm(Z - np.fft.fft(z, axis=-1))
                  / np.linalg.norm(Z))
            signal.alarm(0)
            print(f"A ragged rows={rows}: rfft {r1:.2e} irfft {r2:.2e} "
                  f"fft {r3:.2e}", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"A ragged rows={rows}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            return  # a fault here poisons the process; stop

    # ---- B. same-shape C2C vs R2C vs C2R (padded serving forms) ----
    for n, rows in [(512, 4096), (1024, 4096), (2048, 4096), (4096, 4096),
                    (8192, 2048), (16384, 1024)]:
        signal.alarm(900)
        try:
            key = jax.random.PRNGKey(n)
            re = jax.random.normal(key, (rows, n), jnp.float32)
            im = jax.random.normal(jax.random.PRNGKey(n + 1), (rows, n),
                                   jnp.float32)
            fc = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, None))
            oc = fc(re, im)
            _ = float(jnp.sum(oc[0][:2, :2]))
            tc = _device_time(fc, (re, im))

            fr = jax.jit(lambda v: pf.rfft_rows_split(v, None, pad_out=True))
            orr = fr(re)
            _ = float(jnp.sum(orr[0][:2, :2]))
            tr = _device_time(fr, (re,))

            bins = pf.pad_bins(n)
            nb = n // 2 + 1
            ri = jnp.arange(bins)
            Xr = jax.random.normal(key, (rows, bins), jnp.float32) * (ri < nb)
            Xi = (jax.random.normal(jax.random.PRNGKey(n + 2), (rows, bins),
                                    jnp.float32) * ((ri > 0) & (ri < n // 2)))
            fi = jax.jit(lambda a, b: pf.irfft_rows_split(
                a, b, n, 1.0 / n, padded_in=True))
            oi = fi(Xr, Xi)
            _ = float(jnp.sum(oi[:2, :2]))
            ti = _device_time(fi, (Xr, Xi))
            signal.alarm(0)
            print(f"B n={n} x {rows}: C2C {tc*1e3:.3f}  R2C {tr*1e3:.3f} "
                  f"({tr/tc:.2f}x)  C2R {ti*1e3:.3f} ({ti/tc:.2f}x)",
                  flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"B n={n} x {rows}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    print("DONE", flush=True)


if __name__ == "__main__":
    main()
