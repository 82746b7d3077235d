#!/usr/bin/env python
"""Probe r44: pallas copy kernels for the four-step edge relayouts.

The four-step pays two XLA relayouts per call for the [.., n] <->
[.., n1, n2] edge views (~560 GB/s measured, ~0.9 ms of the 1.96 ms at
2^22 x4).  Both edges are CONTIGUOUS-block correspondences — flat block
(1, K*n2) <-> 3-D block (1, K, n2) — so a trivial pallas copy with an
in-kernel sublane split/merge (legal: minor dim is a 128 multiple)
should run at the ~80%-of-peak pallas copy floor instead.

Measures: (a) XLA reshape each way, (b) pallas copy each way, (c) the
full four-step with pallas edges vs production.

Run: nohup setsid python scripts/probe_r44.py > /tmp/probe_r44.out 2>&1 &
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _device_time
from fft_wgpu_tpu.ops import fourstep, pallas_fft as pf


def tcase(tag, fn, args, chk=None):
    try:
        t0 = time.time()
        out = fn(*args)
        rel = chk(out) if chk else float("nan")
        if chk and rel > 5e-6:
            print(f"{tag}: WRONG rel={rel:.1e}", flush=True)
            return None
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms rel={rel:.1e} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return t
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def _k_split(x_ref, o_ref, *, K, n2, b):
    o_ref[...] = x_ref[...].reshape(b, K, n2)


def _k_merge(x_ref, o_ref, *, K, n2, b):
    o_ref[...] = x_ref[...].reshape(b, K * n2)


def pallas_split(x, n1, n2, K=8):
    """[b, n] -> [b, n1, n2] as a pallas copy (contiguous both sides).
    Blocks carry the FULL batch dim (Mosaic: the last two block dims must
    be (8,128)-divisible or equal the array dims)."""
    b = x.shape[0]
    kern = functools.partial(_k_split, K=K, n2=n2, b=b)
    return pl.pallas_call(
        kern,
        grid=(n1 // K,),
        in_specs=[pl.BlockSpec((b, K * n2), lambda j: (0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, K, n2), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n1, n2), x.dtype),
    )(x)


def pallas_merge(x, K=8):
    """[b, n1, n2] -> [b, n1*n2] as a pallas copy."""
    b, n1, n2 = x.shape
    kern = functools.partial(_k_merge, K=K, n2=n2, b=b)
    return pl.pallas_call(
        kern,
        grid=(n1 // K,),
        in_specs=[pl.BlockSpec((b, K, n2), lambda j: (0, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((b, K * n2), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n1 * n2), x.dtype),
    )(x)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r44 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    n = 1 << 22
    b = 4
    n1, n2 = fourstep.choose_factors(n)  # (1024, 4096)
    print(f"factors: {n1} x {n2}", flush=True)
    re = jax.random.normal(k0, (b, n), jnp.float32)
    re3 = jax.random.normal(k1, (b, n1, n2), jnp.float32)

    # ---- edge relayouts in isolation (xla vs pallas, both directions) ----
    x_host = None
    fn = jax.jit(lambda a: a.reshape(b, n1, n2) + 0.0)
    tcase("xla reshape flat->3d", fn, (re,))
    fn = jax.jit(lambda a: a.reshape(b, n) + 0.0)
    tcase("xla reshape 3d->flat", fn, (re3,))

    for K in (8, 32, 128):
        def chk_s(out, K=K):
            return float(jnp.max(jnp.abs(
                out - re.reshape(b, n1, n2))))
        fn = jax.jit(lambda a, K=K: pallas_split(a, n1, n2, K))
        tcase(f"pallas split K={K}", fn, (re,), chk_s)
        def chk_m(out, K=K):
            return float(jnp.max(jnp.abs(out - re3.reshape(b, n))))
        fn = jax.jit(lambda a, K=K: pallas_merge(a, K))
        tcase(f"pallas merge K={K}", fn, (re3,), chk_m)

    # ---- full four-step with pallas edges vs production ----
    im = jax.random.normal(k1, (b, n), jnp.float32)
    z = np.asarray(re[:1, :65536]).astype(np.float64)  # spot oracle rows

    def chk4(out):
        got = np.asarray(out[0][0, :65536]) + 1j * np.asarray(out[1][0, :65536])
        want = np.fft.fft(np.asarray(re[0]) + 1j * np.asarray(im[0]))[:65536]
        return float(np.linalg.norm(got - want) / np.linalg.norm(want))

    fn_prod = jax.jit(lambda a, c: fourstep.fft_last_axis(a, c, -1, None))
    t_prod = tcase("four-step 2^22x4 production", fn_prod, (re, im), chk4)

    def fourstep_pedges(a, c, K=32):
        a3 = pallas_split(a, n1, n2, K)
        c3 = pallas_split(c, n1, n2, K)
        from fft_wgpu_tpu.plan.plan import get_plan
        p1 = get_plan(n1, "auto")
        br, bi = p1._execute_split_axis(a3, c3, -1, None, -2)
        dr, di = pf.fft_rows_transposed_split(br, bi, -1, None, outer=(n1, n))
        return pallas_merge(dr, K), pallas_merge(di, K)

    fn_p = jax.jit(fourstep_pedges)
    t_p = tcase("four-step 2^22x4 pallas edges", fn_p, (re, im), chk4)
    if t_prod and t_p:
        print(f"  -> pallas edges {t_prod/t_p:.3f}x", flush=True)

    # 2^21 x 8 as well
    n_b = 1 << 21
    n1b, n2b = fourstep.choose_factors(n_b)
    reb = jax.random.normal(k0, (8, n_b), jnp.float32)
    imb = jax.random.normal(k1, (8, n_b), jnp.float32)

    def chk4b(out):
        got = np.asarray(out[0][0, :65536]) + 1j * np.asarray(out[1][0, :65536])
        want = np.fft.fft(np.asarray(reb[0]) + 1j * np.asarray(imb[0]))[:65536]
        return float(np.linalg.norm(got - want) / np.linalg.norm(want))

    import fft_wgpu_tpu.ops.bigfft as bigfft
    old_max = bigfft.BIG_MAX_N
    bigfft.BIG_MAX_N = 0  # force the four-step path for the A/B
    try:
        fn_prodb = jax.jit(lambda a, c: fourstep.fft_last_axis(a, c, -1, None))
        t_pb0 = tcase("four-step 2^21x8 production", fn_prodb, (reb, imb), chk4b)

        def fourstep_pedges_b(a, c, K=32):
            a3 = pallas_split(a, n1b, n2b, K)
            c3 = pallas_split(c, n1b, n2b, K)
            from fft_wgpu_tpu.plan.plan import get_plan
            p1 = get_plan(n1b, "auto")
            br, bi = p1._execute_split_axis(a3, c3, -1, None, -2)
            dr, di = pf.fft_rows_transposed_split(br, bi, -1, None,
                                                  outer=(n1b, n_b))
            return pallas_merge(dr, K), pallas_merge(di, K)

        fn_pb = jax.jit(fourstep_pedges_b)
        t_pb = tcase("four-step 2^21x8 pallas edges", fn_pb, (reb, imb), chk4b)
        if t_pb0 and t_pb:
            print(f"  -> pallas edges {t_pb0/t_pb:.3f}x", flush=True)
    finally:
        bigfft.BIG_MAX_N = old_max

    print("probe_r44 done", flush=True)


if __name__ == "__main__":
    main()
