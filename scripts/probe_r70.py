#!/usr/bin/env python
"""Round-5 probe: exploit the two toolchain_watch CHANGED doors.

  A. >128-prime factor dims now compile (prime257_hang CHANGED):
     measure the general one-pass kernel with splits like (17, 241) at
     the Bluestein bench shapes — 4097 x 1024 runs 1.553 ms via two
     fused m=16384 passes; a one-pass (17,241) kernel could halve it.
  B. (128,128) chains now compile (split_128_128 CHANGED): measure the
     two-level (128,128) balanced schedule at n=16384 vs the production
     DIT chain (0.772 ms, 84% of bound 0.649).
  C. re-probe the round-4 R2C general compile blowups (n=1000/4095 blew
     a 900 s budget) — if fast now, the odd-n allowlist can open up.

One case per hard-killed subprocess (the hang class may come back at
other shapes even if the probed ones pass).
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = [
    ("gen771", "general C2C (3,257) @ 771x512"),
    ("gen4097", "general C2C (17,241) @ 4097x1024"),
    ("gen514", "general C2C (2,257) @ 514x1024"),
    ("b16384", "(128,128) balanced @ 16384x1024 vs production"),
    ("r2c1000", "R2C general @ 1000x1024 (round-4 compile blowup)"),
    ("r2c4095", "R2C general @ 4095x1024 (round-4 compile blowup)"),
]


def _gen_case(n, rows, split):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _device_time
    from fft_wgpu_tpu.ops import pallas_fft as pf
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    pf._choose_general_split = lambda _n: split
    rng = np.random.default_rng(0)
    x = rng.standard_normal((rows, n)).astype(np.float32)
    y = rng.standard_normal((rows, n)).astype(np.float32)
    f = jax.jit(lambda a, b: pf.fft_rows_general_split(a, b, -1))
    o = f(jnp.asarray(x), jnp.asarray(y))
    got = np.asarray(o[0]) + 1j * np.asarray(o[1])
    want = np.fft.fft(x + 1j * y, axis=-1)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    t = _device_time(f, (jnp.asarray(x), jnp.asarray(y)))
    print(f"PROBE_OK {t*1e3:.3f} ms rel={rel:.2e}", flush=True)


def child(case):
    if case == "gen771":
        _gen_case(771, 512, (3, 257))
    elif case == "gen4097":
        _gen_case(4097, 1024, (17, 241))
    elif case == "gen514":
        _gen_case(514, 1024, (2, 257))
    elif case == "b16384":
        import jax
        import jax.numpy as jnp
        import numpy as np

        from bench import _device_time
        from fft_wgpu_tpu.ops import pallas_fft as pf
        from fft_wgpu_tpu.utils.io import (
            enable_persistent_compilation_cache,
        )

        enable_persistent_compilation_cache()
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1024, 16384)).astype(np.float32)
        y = rng.standard_normal((1024, 16384)).astype(np.float32)
        xr, yr = jnp.asarray(x), jnp.asarray(y)
        prod = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        tp = _device_time(prod, (xr, yr))
        # force the 2-level (128,128) classic schedule
        pf._BALANCED.pop(16384, None)
        pf._choose_split = lambda n: (128, 128)
        two = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                        schedule="classic"))
        o = two(xr, yr)
        got = np.asarray(o[0]) + 1j * np.asarray(o[1])
        want = np.fft.fft(x + 1j * y, axis=-1)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        tt = _device_time(two, (xr, yr))
        print(f"PROBE_OK prod {tp*1e3:.3f} ms vs (128,128) {tt*1e3:.3f} "
              f"ms rel={rel:.2e}", flush=True)
    elif case in ("r2c1000", "r2c4095"):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from bench import _device_time
        from fft_wgpu_tpu.ops.pallas_fft import rfft_rows_general_split
        from fft_wgpu_tpu.utils.io import (
            enable_persistent_compilation_cache,
        )

        enable_persistent_compilation_cache()
        n = 1000 if case == "r2c1000" else 4095
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1024, n)).astype(np.float32)
        f = jax.jit(lambda v: rfft_rows_general_split(v, None))
        o = f(jnp.asarray(x))
        got = np.asarray(o[0]) + 1j * np.asarray(o[1])
        want = np.fft.rfft(x, axis=-1)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        t = _device_time(f, (jnp.asarray(x),))
        print(f"PROBE_OK {t*1e3:.3f} ms rel={rel:.2e}", flush=True)


def parent():
    env = dict(os.environ)
    for case, desc in CASES:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), case],
                timeout=900, capture_output=True, text=True, env=env,
                start_new_session=True)
            out = p.stdout + p.stderr
            keep = [ln for ln in out.splitlines()
                    if ln.strip() and not any(kw in ln for kw in (
                        "WARNING", "INFO ", "common_lib", "libtpu",
                        "Source Location", "WARN"))]
            print(f"[{case} {time.time()-t0:.0f}s rc={p.returncode}] "
                  f"{desc}: " + (" | ".join(keep[-1:]) or "(no output)"),
                  flush=True)
        except subprocess.TimeoutExpired:
            print(f"[{case}] HUNG >900s — killed; cooling 180s",
                  flush=True)
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
    if len(sys.argv) == 2:
        child(sys.argv[1])
    else:
        parent()
