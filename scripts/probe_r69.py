#!/usr/bin/env python
"""Round-5 probe: which piece of the fused welch kernel breaks Mosaic?
(bench row failed with a remote-compile HTTP 500)

One candidate per hard-killed subprocess:
  A. sublane-OFFSET slice: o = x[1:129] of a [256, n] vreg array
  B. frames build: lane-concat of two offset sublane slices
  C. revisited-accumulator output (o_ref[:] += p across grid steps)
  D. full welch kernel, small shape

Usage: python scripts/probe_r69.py          (parent ladder)
       python scripts/probe_r69.py <case>   (child)
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def child(case):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()

    if case == "A":
        def k(x_ref, o_ref):
            o_ref[:] = x_ref[1:129, :]

        x = jnp.arange(256 * 256, dtype=jnp.float32).reshape(256, 256)
        r = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32))(x)
        ok = float(jnp.max(jnp.abs(r - x[1:129]))) == 0.0
        print("PROBE_OK" if ok else f"WRONG {r[0,0]}", flush=True)

    elif case == "B":
        def k(x_ref, o_ref):
            c = x_ref[:]
            o_ref[:] = jnp.concatenate([c[0:128], c[1:129]], axis=1)

        x = jnp.arange(256 * 256, dtype=jnp.float32).reshape(256, 256)
        r = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 512), jnp.float32))(x)
        want = jnp.concatenate([x[0:128], x[1:129]], axis=1)
        ok = float(jnp.max(jnp.abs(r - want))) == 0.0
        print("PROBE_OK" if ok else "WRONG", flush=True)

    elif case == "C":
        def k(x_ref, o_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                o_ref[:] = x_ref[:]

            @pl.when(i > 0)
            def _():
                o_ref[:] = o_ref[:] + x_ref[:]

        x = jnp.ones((512, 256), jnp.float32)
        r = pl.pallas_call(
            k, grid=(4,),
            in_specs=[pl.BlockSpec((128, 256), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, 256), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32))(x)
        ok = float(jnp.max(jnp.abs(r - 4.0))) == 0.0
        print("PROBE_OK" if ok else "WRONG", flush=True)

    elif case == "D":
        from fft_wgpu_tpu.ops import pallas_welch as pw

        rng = np.random.default_rng(0)
        t, nperseg, hop = 1 << 16, 512, 256
        x = rng.standard_normal(t).astype(np.float32)
        win = np.hanning(nperseg).astype(np.float32)
        psum, num = jax.jit(lambda v: pw.welch_accum_split(
            v, win, nperseg, hop, nperseg, "constant"))(jnp.asarray(x))
        acc = np.zeros(nperseg // 2 + 1)
        for s in range(num):
            fr = x[s * hop: s * hop + nperseg].astype(np.float64)
            fr = fr - fr.mean()
            acc += np.abs(np.fft.rfft(fr * win)) ** 2
        rel = np.linalg.norm(np.asarray(psum) - acc) / np.linalg.norm(acc)
        print(f"PROBE_OK rel={rel:.2e}", flush=True)


def parent():
    env = dict(os.environ)
    for case in ("A", "B", "C", "D"):
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), case],
                timeout=420, capture_output=True, text=True, env=env,
                start_new_session=True)
            out = p.stdout + p.stderr
            keep = [ln for ln in out.splitlines()
                    if ln.strip() and not any(kw in ln for kw in (
                        "WARNING", "INFO ", "common_lib", "libtpu",
                        "Source Location", "WARN"))]
            print(f"[{case} {time.time()-t0:.0f}s rc={p.returncode}] "
                  + (" | ".join(keep[-2:]) or "(no output)"), flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{case}] HUNG >420s — killed; cooling 180s", flush=True)
            time.sleep(180)


if __name__ == "__main__":
    if len(sys.argv) == 2:
        child(sys.argv[1])
    else:
        parent()
