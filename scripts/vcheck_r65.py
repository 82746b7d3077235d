#!/usr/bin/env python
"""Round-4 probe E: composite non-pow2 ND transforms on hardware through
production routing (general rows kernel on axis -1 + composite ax0
kernel on axis -2; all factor dims <= 128, the compile-safe class).

Run: nohup setsid python scripts/vcheck_r65.py > /tmp/vcheck_r65.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops.nd import fftn_split


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    def run(tag, shape, axes, budget=900):
        try:
            signal.alarm(budget)
            x = rng.standard_normal(shape).astype(np.float32)
            y = rng.standard_normal(shape).astype(np.float32)
            f = jax.jit(lambda a, b: fftn_split(a, b, axes, -1, None))
            o = f(jnp.asarray(x), jnp.asarray(y))
            got = np.asarray(o[0]) + 1j * np.asarray(o[1])
            want = np.fft.fftn(x + 1j * y, axes=axes)
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            t = _device_time(f, (jnp.asarray(x), jnp.asarray(y)))
            signal.alarm(0)
            print(f"{tag}: {t*1e3:.3f} ms rel={rel:.2e}", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    run("fft2 1000x1000 (single plane)", (1000, 1000), (-2, -1))
    run("fft2 64x1000x1000 (batched planes)", (64, 1000, 1000), (-2, -1))
    run("fftn 640^3", (640, 640, 640), (0, 1, 2), budget=1200)
    print("vcheck_r65 done", flush=True)


if __name__ == "__main__":
    main()
