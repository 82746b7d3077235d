#!/usr/bin/env python
"""Round-5 probe: the EXTENDED general-kernel envelope (factors <= 256,
probe_r70) through the PUBLIC routing — every kernel family that
_choose_general_split now feeds, one case per hard-killed subprocess.

  fft4097   public fft, C2C rows general (17,241)     [cached from r70]
  rfft4097  public rfft, ODD R2C general (17,241)     [new compile]
  rfft771   public rfft, ODD R2C general (3,257)      [new compile]
  rfft1000  public rfft, EVEN non-pow2 via the newly-routed general
            R2C (was the packed XLA path)             [cached from r70]
  fft2_514  public fft2 on [2, 514, 514]: ax0 general (2,257) + rows
            general (2,257)                           [new compiles]
"""
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

CASES = ["fft4097", "rfft4097", "rfft771", "rfft1000", "fft2_514"]


def child(case):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import fft_wgpu_tpu as ftt
    from fft_wgpu_tpu import device_get_complex as dget
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    rng = np.random.default_rng(0)

    if case == "fft4097":
        x = (rng.standard_normal((1024, 4097))
             + 1j * rng.standard_normal((1024, 4097))).astype(np.complex64)
        got = dget(ftt.fft(x))
        want = np.fft.fft(x, axis=-1)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        from fft_wgpu_tpu.ops.stockham import fft_last_axis
        f = jax.jit(lambda a, b: fft_last_axis(a, b, -1))
        t = _device_time(f, (jnp.asarray(x.real), jnp.asarray(x.imag)))
        print(f"PROBE_OK {t*1e3:.3f} ms rel={rel:.2e} "
              f"(Bluestein row was 1.553 ms)", flush=True)
    elif case in ("rfft4097", "rfft771", "rfft1000"):
        n = int(case[4:])
        x = rng.standard_normal((1024, n)).astype(np.float32)
        got = dget(ftt.rfft(x))
        want = np.fft.rfft(x, axis=-1)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        f = jax.jit(lambda v: jnp.real(ftt.rfft(v)))
        t = _device_time(lambda v: (f(v),), (jnp.asarray(x),))
        print(f"PROBE_OK {t*1e3:.3f} ms rel={rel:.2e}", flush=True)
    elif case == "fft2_514":
        x = (rng.standard_normal((2, 514, 514))
             + 1j * rng.standard_normal((2, 514, 514))).astype(np.complex64)
        got = dget(ftt.fft2(x))
        want = np.fft.fft2(x)
        rel = np.linalg.norm(got - want) / np.linalg.norm(want)
        print(f"PROBE_OK rel={rel:.2e}", flush=True)


def parent():
    env = dict(os.environ)
    for case in CASES:
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
                  + (" | ".join(keep[-1:]) or "(no output)"), flush=True)
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
