#!/usr/bin/env python
"""Round-3 probe K (VERDICT items 1+4): CROSS-STEP pipelined balanced rows.

probe_r45's pipe2 (256-row block as two halves) won 0.621 -> 0.611 at 4096
but paid a block-size penalty first (bt=256 single-pass costs 0.710), got
WORSE at 8192 and exceeded the compile-service VMEM budget at 16384.  This
variant gets the same MXU/VPU overlap with NO block growth: grid runs
G + 1 steps of 128-row blocks, the VPU chain of block i executes in the
same kernel body as the MXU dot of block i-1 (chain output parked in a
parity-indexed persistent scratch), so the scheduler can hide one under
the other while Pallas's own double-buffering keeps streaming 128-row
blocks.  Output block index lags input by one (revisit semantics skip the
step-0 garbage copy).

Also: 16384 chain variants for the (256,64) pin, and (512,32,(8,8,8)).

Run: nohup setsid python scripts/probe_r51.py > /tmp/probe_r51.out 2>&1 &
"""
import functools
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fft_wgpu_tpu.ops import pallas_fft as pf


def _kernel_xstep(xr_ref, xi_ref, or_ref, oi_ref, sr, si, *, n, n1, n2,
                  sign, scale, factors, G):
    i = pl.program_id(0)
    bt = xr_ref.shape[0]

    @pl.when(i < G)
    def _chain():
        ar = xr_ref[:].T.reshape(n1, n2, bt)
        ai = xi_ref[:].T.reshape(n1, n2, bt)
        br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, factors)
        twr, twi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        p = jax.lax.rem(i, 2)
        sr[p] = cr.reshape(n, bt)
        si[p] = ci.reshape(n, bt)

    @pl.when(i > 0)
    def _dot():
        q = jax.lax.rem(i - 1, 2)
        cr = sr[q].reshape(n1, n2, bt)
        ci = si[q].reshape(n1, n2, bt)
        if 2 * n2 <= 128:
            dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)),
                                      scale)
        else:
            w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                              ((1,), (1,)))
        or_ref[:] = dr.reshape(n, bt).T
        oi_ref[:] = di.reshape(n, bt).T


def rows_bal_xstep(re, im, sign, scale=None, interpret=False):
    rows, n = re.shape
    n1, n2, factors = pf._BALANCED[n]
    bt = 128
    G = rows // bt
    kern = functools.partial(
        _kernel_xstep, n=n, n1=n1, n2=n2, sign=sign,
        scale=float(scale) if scale else 1.0, factors=factors, G=G)
    in_spec = pl.BlockSpec((bt, n), lambda i: (jnp.minimum(i, G - 1), 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, n), lambda i: (jnp.maximum(i - 1, 0), 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(G + 1,),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, n, bt), jnp.float32),
            pltpu.VMEM((2, n, bt), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(re, im)


def rel_split(a, b, c, d):
    return float(jax.jit(
        lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
    )(a, b, c, d))


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    # ---- K. cross-step pipelined balanced rows ----
    for n, rows in [(4096, 4096), (2048, 2048), (1024, 2048), (512, 2560),
                    (8192, 1024), (16384, 1024)]:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        try:
            f0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
            o0 = f0(re, im)
            _ = float(jnp.sum(o0[0][:2, :2]))
            t0 = _device_time(f0, (re, im))
            signal.alarm(900)
            fb = jax.jit(lambda a, b: rows_bal_xstep(a, b, -1))
            tc = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            signal.alarm(0)
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"K n={n} x {rows}: prod {t0*1e3:.3f} -> xstep "
                  f"{tb*1e3:.3f} ms (compile {comp:.0f}s, rel {rel:.2e})",
                  flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"K n={n}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # ---- L. 16384 chain/split variants through production routing ----
    n, rows = 16384, 1024
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
    orig = pf._BALANCED[n]
    f0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:2, :2]))
    t0 = _device_time(f0, (re, im))
    print(f"L 16384 pinned {orig}: {t0*1e3:.3f} ms", flush=True)
    for ent in [(256, 64, (8, 8, 4)), (256, 64, (4, 4, 4, 4)),
                (256, 64, (2, 4, 8, 4)), (512, 32, (8, 8, 8)),
                (512, 32, (4, 8, 4, 4))]:
        pf._BALANCED[n] = ent
        try:
            signal.alarm(900)
            fb = jax.jit(lambda a, b: pf._fft_batched_core(a, b, -1, None))
            tc = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            signal.alarm(0)
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"L 16384 {ent}: {tb*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"L 16384 {ent}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            pf._BALANCED[n] = orig


if __name__ == "__main__":
    main()
