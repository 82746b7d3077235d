#!/usr/bin/env python
"""Production validation of the r54 pipe adoptions (ax0/ax3) on TPU:
oracle-checked + timed through the real routing (fftn, fft_axis0_split).

Run: nohup setsid python scripts/vcheck_r54.py > /tmp/vcheck_r54.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fft_wgpu_tpu.ops import pallas_fft as pf
from fft_wgpu_tpu.ops.nd import fftn_split


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    def check(tag, fn, args, oracle, budget=900):
        try:
            signal.alarm(budget)
            f = jax.jit(fn)
            o = f(*args)
            _ = float(jnp.sum(o[0].ravel()[:4]))
            ref = jax.jit(oracle)(*args)
            rel = float(jax.jit(lambda a, b, c: jnp.sqrt(
                (jnp.sum((a - jnp.real(c)) ** 2)
                 + jnp.sum((b - jnp.imag(c)) ** 2))
                / (jnp.sum(jnp.real(c) ** 2) + jnp.sum(jnp.imag(c) ** 2)))
            )(o[0], o[1], ref))
            t = _device_time(f, args)
            signal.alarm(0)
            print(f"{tag}: {t*1e3:.3f} ms (rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # 3-D cubes through production fftn (rows + ax0 + ax3 passes)
    for nc in (256, 512):
        re = jax.random.normal(jax.random.PRNGKey(0), (nc,) * 3,
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (nc,) * 3,
                               jnp.float32)
        check(f"fftn {nc}^3",
              lambda a, b: fftn_split(a, b, (0, 1, 2), -1, None),
              (re, im),
              lambda a, b: jnp.fft.fftn(jax.lax.complex(a, b)))
        del re, im

    # ax0 production at the pipe sizes
    for (b, n, m) in [(512, 512, 512), (64, 128, 16384), (64, 256, 8192)]:
        re = jax.random.normal(jax.random.PRNGKey(2), (b, n, m),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(3), (b, n, m),
                               jnp.float32)
        check(f"ax0 [{b},{n},{m}]",
              lambda a, c: pf.fft_axis0_split(a, c, -1), (re, im),
              lambda a, c: jnp.fft.fft(jax.lax.complex(a, c), axis=-2))
        del re, im

    # 2-D fft2 512^2 x batch (fused-plane envelope check unaffected?)
    re = jax.random.normal(jax.random.PRNGKey(4), (64, 512, 512),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(5), (64, 512, 512),
                           jnp.float32)
    check("fft2 64 x 512^2",
          lambda a, b: fftn_split(a, b, (-2, -1), -1, None), (re, im),
          lambda a, b: jnp.fft.fft2(jax.lax.complex(a, b)))


if __name__ == "__main__":
    main()
