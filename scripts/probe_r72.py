#!/usr/bin/env python
"""Round-5 probe: BATCHED single-pass big kernel vs the two-pass
four-step for multi-row large-N (the [rows, 1, n] 3-D-block form that
lifts the old single-row restriction).

One (n, rows) case per hard-killed subprocess; each child measures BOTH
paths (bigfft forced off via BIG_MAX_N=0 for the four-step variant).
The verdict pins fourstep.fft_last_axis's batched routing.
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = [(1 << 21, 8), (1 << 20, 8), (1 << 18, 64), (1 << 15, 512)]


def child(n, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _device_time
    from fft_wgpu_tpu.ops import bigfft, fourstep
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)

    big = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
    o = big(re, im)
    # correctness vs one XLA row (keep the oracle cheap)
    ref = jnp.fft.fft(jax.lax.complex(re[0], im[0]))
    rel = float(jnp.sqrt(
        (jnp.sum((o[0][0] - jnp.real(ref)) ** 2
                 + (o[1][0] - jnp.imag(ref)) ** 2))
        / jnp.sum(jnp.real(ref) ** 2 + jnp.imag(ref) ** 2)))
    tb = _device_time(big, (re, im))

    saved = bigfft.BIG_MAX_N
    bigfft.BIG_MAX_N = 0  # force the four-step path
    try:
        four = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1))
        tf = _device_time(four, (re, im))
    finally:
        bigfft.BIG_MAX_N = saved
    print(f"PROBE_OK big {tb*1e3:.3f} ms vs four-step {tf*1e3:.3f} ms "
          f"({tf/tb:.2f}x) rel={rel:.2e}", flush=True)


def parent():
    env = dict(os.environ)
    for n, rows in CASES:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n),
                 str(rows)],
                timeout=900, capture_output=True, text=True, env=env,
                start_new_session=True)
            out = p.stdout + p.stderr
            keep = [ln for ln in out.splitlines()
                    if ln.strip() and not any(kw in ln for kw in (
                        "WARNING", "INFO ", "common_lib", "libtpu",
                        "Source Location", "WARN"))]
            print(f"[2^{n.bit_length()-1} x{rows} {time.time()-t0:.0f}s "
                  f"rc={p.returncode}] "
                  + (" | ".join(keep[-1:]) or "(no output)"), flush=True)
        except subprocess.TimeoutExpired:
            print(f"[2^{n.bit_length()-1} x{rows}] HUNG >900s — killed; "
                  "cooling 180s", flush=True)
            time.sleep(180)
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print('rec', float(jax.jit(jnp.sum)(jnp.ones((4,4)))))"],
                timeout=600, capture_output=True, text=True, env=env)
            print(f"recovery: {'ok' if 'rec' in r.stdout else 'NOT RECOVERED'}",
                  flush=True)
            if "rec" not in r.stdout:
                return


if __name__ == "__main__":
    if len(sys.argv) == 3:
        child(int(sys.argv[1]), int(sys.argv[2]))
    else:
        parent()
