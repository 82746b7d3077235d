#!/usr/bin/env python
"""Round-4 probe A: edge-tiled ragged batches + fused Bluestein on TPU.

Validates the two round-4 kernel changes through production routing:

  1. `_edge_tiled` (pallas_fft) — ragged extents now run a full-block
     main grid over the UNPADDED array plus a one-tile tail call (the
     round-3 whole-array pad+slice cost the 2500x512 bench 0.055 ->
     0.095 ms).  Hardware risk to clear: the main call's out_shape is
     ragged while its grid covers only the full blocks — probe_r57
     showed ragged EDGE BLOCKS fault the worker; an uncovered ragged
     remainder must not.  Safety ladder ordered ragged-last per section.
  2. Fused Bluestein (chirp+pad in the forward load, filter+slice+chirp
     in the inverse load/store, stage-2 row cut).  Targets (VERDICT r3
     item 3): 4097x1024 <= 1.6 ms (was 2.347), 4093x1024 <= 0.85 (was
     1.148).

Run: nohup setsid python scripts/vcheck_r60.py > /tmp/vcheck_r60.out 2>&1 &
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
    rng = np.random.default_rng(0)

    def run(tag, fn, args, want, budget=900, time_it=True):
        try:
            signal.alarm(budget)
            f = jax.jit(fn)
            o = f(*args)
            if isinstance(o, tuple):
                got = np.asarray(o[0]) + 1j * np.asarray(o[1])
            else:
                got = np.asarray(o)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            t = _device_time(f, args) if time_it else None
            signal.alarm(0)
            ts = f" {t*1e3:.3f} ms" if t else ""
            print(f"{tag}:{ts} rel={rel:.2e}", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    # ---- A. ragged safety ladder (aligned first, ragged after) ----
    for rows, n in [(2560, 512), (2500, 512), (400, 512), (300, 4096),
                    (68, 512)]:
        x = rng.standard_normal((rows, n)).astype(np.float32)
        y = rng.standard_normal((rows, n)).astype(np.float32)
        run(f"c2c rows={rows} n={n}",
            lambda a, b: pf.fft_batched_split(a, b, -1, None),
            (jnp.asarray(x), jnp.asarray(y)),
            np.fft.fft(x + 1j * y, axis=-1))

    x = rng.standard_normal((300, 4096)).astype(np.float32)
    run("r2c rows=300 n=4096",
        lambda v: pf.rfft_rows_split(v, None), (jnp.asarray(x),),
        np.fft.rfft(x, axis=-1))
    X = np.fft.rfft(x, axis=-1)
    run("c2r rows=300 n=4096",
        lambda a, b: pf.irfft_rows_split(a, b, 4096, 1.0 / 4096),
        (jnp.asarray(X.real.astype(np.float32)),
         jnp.asarray(X.imag.astype(np.float32))),
        x)

    # ax0 ragged lane extent (and the new pipe-on-ragged main grid)
    z = (rng.standard_normal((2, 512, 300)).astype(np.float32)
         + 1j * rng.standard_normal((2, 512, 300)).astype(np.float32))
    run("ax0 n=512 lanes=300",
        lambda a, b: pf.fft_axis0_split(a, b, -1, None),
        (jnp.asarray(z.real), jnp.asarray(z.imag)),
        np.fft.fft(z, axis=-2))

    # rows_t ragged R with outer twiddle (the row_off path)
    R, n = 300, 512
    w = (rng.standard_normal((R, n)).astype(np.float32)
         + 1j * rng.standard_normal((R, n)).astype(np.float32))
    outer_n = R * n
    r_idx = np.arange(R)[:, None]
    m_idx = np.arange(n)[None, :]
    tw = np.exp(-2j * np.pi * ((r_idx * m_idx) % outer_n) / outer_n)
    run("rows_t R=300 outer",
        lambda a, b: pf.fft_rows_transposed_split(
            a, b, -1, outer=(R, outer_n)),
        (jnp.asarray(w.real), jnp.asarray(w.imag)),
        np.fft.fft(w * tw, axis=-1).T)

    # ---- B. the bench-shape regression target + headline sanity ----
    x = rng.standard_normal((2500, 512)).astype(np.float32)
    y = rng.standard_normal((2500, 512)).astype(np.float32)
    run("BENCH 2500x512 (target <= 0.06 ms, r03 was 0.095)",
        lambda a, b: pf.fft_batched_split(a, b, -1, None),
        (jnp.asarray(x), jnp.asarray(y)),
        np.fft.fft(x + 1j * y, axis=-1))
    re = jax.random.normal(jax.random.PRNGKey(0), (4096, 4096), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (4096, 4096), jnp.float32)
    ref = None
    try:
        signal.alarm(900)
        f = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, None))
        o = f(re, im)
        _ = float(jnp.sum(o[0].ravel()[:4]))
        t = _device_time(f, (re, im))
        signal.alarm(0)
        print(f"HEADLINE 4096x4096 (expect ~0.611): {t*1e3:.3f} ms",
              flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"HEADLINE: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # ---- C. fused Bluestein ----
    from fft_wgpu_tpu.ops.bluestein import fft_bluestein_split
    for n2, b2 in [(4097, 1024), (4093, 1024)]:
        xr = rng.standard_normal((b2, n2)).astype(np.float32)
        xi = rng.standard_normal((b2, n2)).astype(np.float32)
        run(f"bluestein n={n2} x{b2} (targets 1.6 / 0.85 ms)",
            lambda a, b: fft_bluestein_split(a, b, -1),
            (jnp.asarray(xr), jnp.asarray(xi)),
            np.fft.fft(xr + 1j * xi, axis=-1))

    print("vcheck_r60 done", flush=True)


if __name__ == "__main__":
    main()
