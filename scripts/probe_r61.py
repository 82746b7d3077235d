#!/usr/bin/env python
"""Round-4 probe B: one more structured crack at the n=16384 cliff
(VERDICT r3 item 6).  Pinned production: balanced (256,64)+(4,8,8) at
0.769-0.773 ms (~42.5% roofline) vs 4096's 53.6%.  The boundary is the
(128,128) compile-service crash (probe_r46/r51); the untried ducks:

  V-A  (128,128)+(4,8,4) straight retry (re-probe on current toolchain)
  V-B  (128,128) with stage-2 as TWO stacked [128,256] real dots
       (dr and di each from their own dot instead of one [256,256]
       realcat / 3-dot Gauss — smaller per-dot shapes, same MACs)
  V-C  (128,128)+(2,8,8) (lighter first chain stage: lower liveness)

Each variant is oracle-checked at 512 rows before timing at 1024.
Run: nohup setsid python scripts/probe_r61.py > /tmp/probe_r61.out 2>&1 &
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

N = 16384


def _kernel_v(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, factors,
              split_dots):
    sign = -1
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    ai = xi_ref[:].T.reshape(n1, n2, bt)
    br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, factors)
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, 1.0)
    xcat = jnp.concatenate([cr, ci], axis=1)  # [n1, 2*n2, bt]
    if split_dots:
        # two stacked [n2, 2*n2] real dots: dr / di separately
        wa = jnp.concatenate([w2r, -w2i], axis=1)
        wb = jnp.concatenate([w2i, w2r], axis=1)
        dr = jax.lax.dot_general(
            wa, xcat, ((((1,), (1,))), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
        di = jax.lax.dot_general(
            wb, xcat, ((((1,), (1,))), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)
    else:
        dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def call_variant(re, im, n1, n2, factors, split_dots):
    rows = re.shape[0]
    bt = 128
    kern = functools.partial(_kernel_v, n=N, n1=n1, n2=n2,
                             factors=factors, split_dots=split_dots)
    spec = pl.BlockSpec((bt, N), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(rows // bt,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, N), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))
    rng = np.random.default_rng(0)

    x = rng.standard_normal((512, N)).astype(np.float32)
    y = rng.standard_normal((512, N)).astype(np.float32)
    want = np.fft.fft(x + 1j * y, axis=-1)
    re_t = jax.random.normal(jax.random.PRNGKey(0), (1024, N), jnp.float32)
    im_t = jax.random.normal(jax.random.PRNGKey(1), (1024, N), jnp.float32)

    # production pin first (sanity + interleaved control)
    try:
        signal.alarm(900)
        f0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, None))
        _ = float(jnp.sum(f0(re_t, im_t)[0].ravel()[:4]))
        t0 = _device_time(f0, (re_t, im_t))
        signal.alarm(0)
        print(f"production (256,64)+(4,8,8): {t0*1e3:.3f} ms", flush=True)
    except Exception as e:
        signal.alarm(0)
        print(f"production: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    variants = [
        ("V-A (128,128)+(4,8,4) gauss", 128, 128, (4, 8, 4), False),
        ("V-B (128,128)+(4,8,4) split-dots", 128, 128, (4, 8, 4), True),
        ("V-C (128,128)+(2,8,8) split-dots", 128, 128, (2, 8, 8), True),
    ]
    for tag, n1, n2, factors, sd in variants:
        try:
            signal.alarm(1200)
            f = jax.jit(lambda a, b, n1=n1, n2=n2, fa=factors, sd=sd:
                        call_variant(a, b, n1, n2, fa, sd))
            o = f(jnp.asarray(x), jnp.asarray(y))
            got = np.asarray(o[0]) + 1j * np.asarray(o[1])
            rel = np.linalg.norm(got - want) / np.linalg.norm(want)
            t = _device_time(f, (re_t[:512], im_t[:512]))
            # time at 1024 rows for comparability with the pin
            f2 = jax.jit(lambda a, b, n1=n1, n2=n2, fa=factors, sd=sd:
                         call_variant(a, b, n1, n2, fa, sd))
            _ = float(jnp.sum(f2(re_t, im_t)[0].ravel()[:4]))
            t2 = _device_time(f2, (re_t, im_t))
            signal.alarm(0)
            print(f"{tag}: rel={rel:.2e} 512r {t*1e3:.3f} ms, "
                  f"1024r {t2*1e3:.3f} ms", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    print("probe_r61 done", flush=True)


if __name__ == "__main__":
    main()
