#!/usr/bin/env python
"""Round-4 probe D: is 4095-general (0.546 ms) REALLY faster than the
4096 production pin (0.611)?  The general kernel does ~7x the 6-pass
MXU MACs, so either non-aligned dots behave differently than the
round-2 cost model, or the profiler mis-sums this program shape.

Cross-checks, all interleaved in one process:
  * profiler device-time AND device-side fori_loop chain timing for
    (a) production 4096, (b) general 4095, (c) general kernel FORCED
    onto 4096 as (64,64) realcat^2 (the round-2c probe measured this
    family at 0.890 — if it now measures ~0.55, the cost model moved);
  * oracle checks for each.

Run: nohup setsid python scripts/probe_r64.py > /tmp/probe_r64.out 2>&1 &
"""
import functools
import signal
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.ops import pallas_fft as pf


def gen4096(re, im):
    """General-kernel body forced onto pow2 4096 as (64,64)."""
    rows = re.shape[0]
    kern = functools.partial(pf._kernel_rows_gen, n=4096, n1=64, n2=64,
                             sign=-1, scale=1.0, n_pad=4096)
    spec = pl.BlockSpec((128, 4096), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(rows // 128,),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, 4096), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def chain_time(fn_split, re, im, iters=32):
    """Device-side fori_loop chain, scalar-readback sync."""
    import time

    @jax.jit
    def run(a, b):
        def body(_, c):
            return fn_split(c[0], c[1])
        a, b = jax.lax.fori_loop(0, iters, body, (a, b))
        return jnp.sum(a[..., 0]) + jnp.sum(b[..., 0])

    _ = float(run(re, im))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(run(re, im))
        best = min(best, time.perf_counter() - t0)
    # dispatch floor
    f = jax.jit(lambda a: jnp.sum(a))
    x = jnp.ones((8, 128))
    _ = float(f(x))
    import time as _t
    floor = 1e9
    for _ in range(5):
        t0 = _t.perf_counter()
        _ = float(f(x))
        floor = min(floor, _t.perf_counter() - t0)
    return max((best - floor) / iters, 1e-9)


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    cases = []
    x6 = rng.standard_normal((1024, 4096)).astype(np.float32)
    y6 = rng.standard_normal((1024, 4096)).astype(np.float32)
    x5 = rng.standard_normal((1024, 4095)).astype(np.float32)
    y5 = rng.standard_normal((1024, 4095)).astype(np.float32)
    cases.append(("prod 4096x1024",
                  lambda a, b: pf.fft_batched_split(a, b, -1, None),
                  (jnp.asarray(x6), jnp.asarray(y6)),
                  np.fft.fft(x6 + 1j * y6, axis=-1)))
    cases.append(("gen 4095x1024",
                  lambda a, b: pf.fft_rows_general_split(a, b, -1),
                  (jnp.asarray(x5), jnp.asarray(y5)),
                  np.fft.fft(x5 + 1j * y5, axis=-1)))
    cases.append(("gen-forced 4096 (64,64)",
                  gen4096,
                  (jnp.asarray(x6), jnp.asarray(y6)),
                  np.fft.fft(x6 + 1j * y6, axis=-1)))

    for rep in range(2):
        for tag, fn, args, want in cases:
            try:
                signal.alarm(900)
                f = jax.jit(fn)
                o = f(*args)
                got = np.asarray(o[0]) + 1j * np.asarray(o[1])
                rel = np.linalg.norm(got - want) / np.linalg.norm(want)
                tp = _device_time(f, args)
                tc = chain_time(fn, *args)
                signal.alarm(0)
                print(f"[rep{rep}] {tag}: profiler {tp*1e3:.3f} ms, "
                      f"chain {tc*1e3:.3f} ms, rel={rel:.2e}", flush=True)
            except Exception as e:
                signal.alarm(0)
                print(f"[rep{rep}] {tag}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    print("probe_r64 done", flush=True)


if __name__ == "__main__":
    main()
