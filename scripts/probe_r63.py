#!/usr/bin/env python
"""Round-4 probe C2: the generic composite-n kernel, ONE case per
process (the first vcheck_r62 attempt hung the compile service inside a
C call where SIGALRM never fires — per-case hard-killed subprocesses +
recovery checks instead).

Usage:  python scripts/probe_r63.py            (parent: runs the ladder)
        python scripts/probe_r63.py <n> <rows> (child: one case)
"""
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = [(1000, 512), (771, 512), (4095, 1024), (4097, 1024),
         (4093, 1024)]


def child(n, rows):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _device_time
    from fft_wgpu_tpu.ops.stockham import fft_last_axis
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows, n)).astype(np.float32)
    y = rng.standard_normal((rows, n)).astype(np.float32)
    f = jax.jit(lambda a, b: fft_last_axis(a, b, -1))
    o = f(jnp.asarray(x), jnp.asarray(y))
    got = np.asarray(o[0]) + 1j * np.asarray(o[1])
    want = np.fft.fft(x + 1j * y, axis=-1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    t = _device_time(f, (jnp.asarray(x), jnp.asarray(y)))
    print(f"n={n} x{rows}: {t*1e3:.3f} ms rel={rel:.2e}", flush=True)


def parent():
    env = dict(os.environ)
    for n, rows in CASES:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), str(n),
                 str(rows)],
                timeout=660, capture_output=True, text=True, env=env,
                start_new_session=True)
            out = (p.stdout + p.stderr)
            keep = [ln for ln in out.splitlines()
                    if not any(k in ln for k in
                               ("WARNING", "INFO ", "common_lib",
                                "libtpu", "WARN", "Source Location"))]
            print(f"[{time.time()-t0:.0f}s rc={p.returncode}] "
                  + (" | ".join(keep[-3:]) or "(no output)"), flush=True)
        except subprocess.TimeoutExpired:
            print(f"n={n} x{rows}: HUNG >660s — killed; cooling down",
                  flush=True)
            time.sleep(180)
            # recovery check before the next case
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax, jax.numpy as jnp;"
                 "print('rec', float(jax.jit(jnp.sum)(jnp.ones((4,4)))))"],
                timeout=600, capture_output=True, text=True, env=env)
            ok = "rec" in r.stdout
            print(f"recovery: {'ok' if ok else 'NOT RECOVERED'}",
                  flush=True)
            if not ok:
                print("aborting ladder", flush=True)
                return
    print("probe_r63 done", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 3:
        child(int(sys.argv[1]), int(sys.argv[2]))
    else:
        parent()
