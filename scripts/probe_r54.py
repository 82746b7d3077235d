#!/usr/bin/env python
"""Round-3 probe P: propagate the pipe2 win to the ax0/ax3/rows_t kernels.

probe_r45's pipe2 (two independent 128-row halves per grid step so one
half's VPU chain hides under the other's MXU dot) won 1.6-20% on the row
kernels.  The same structure applies to every other balanced kernel:

  - ax0 (columns): two 128-LANE halves per (1, n, 256) block
    [four-step pass 1 at 0.529/0.564 ms, 3-D ax0 passes, 2-D columns]
  - ax3 (leading axis): two st-halves, with and without block growth
    [512^3's 4.22 ms pass]
  - rows_t (transposed rows): two 128-row halves per (1, 256, n) block
    [four-step pass 2 at 0.630, fft2 passes at 0.592]

Run: nohup setsid python scripts/probe_r54.py > /tmp/probe_r54.out 2>&1 &
"""
import functools
import math
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


# ---------------------------------------------------------------- ax0 pipe
def _kernel_ax0_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale, half):
    for p in range(2):
        sl = slice(p * half, (p + 1) * half)
        ar = xr_ref[0][:, sl].reshape(n1, n2, half)
        ai = xi_ref[0][:, sl].reshape(n1, n2, half)
        if n1 in pf._S1_CHAINS:
            br, bi = pf._vpu_dft_leading(ar, ai, n1, sign,
                                         pf._S1_CHAINS[n1])
        elif 2 * n1 <= 128:
            br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
        else:
            w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
            br, bi = pf._cdot(w1r, w1r + w1i, w1i - w1r, ar, ai,
                              ((1,), (0,)))
        twr, twi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        if 2 * n2 <= 128 and scale == 1.0:
            dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
        else:
            w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                              ((1,), (1,)))
        or_ref[0, :, sl] = dr.reshape(n, half)
        oi_ref[0, :, sl] = di.reshape(n, half)


def ax0_pipe(re, im, sign, scale=None):
    lead = re.shape[:-2]
    n, m = re.shape[-2:]
    b = int(np.prod(lead)) if lead else 1
    re3 = re.reshape(b, n, m)
    im3 = im.reshape(b, n, m)
    n1, n2 = pf._choose_split_sublane(n)
    lt = 256
    kern = functools.partial(
        _kernel_ax0_pipe, n=n, n1=n1, n2=n2, sign=sign,
        scale=float(scale) if scale is not None else 1.0, half=128)
    spec = pl.BlockSpec((1, n, lt), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(m, lt)),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re3, im3)
    return out[0].reshape(*lead, n, m), out[1].reshape(*lead, n, m)


# ---------------------------------------------------------------- ax3 pipe
def _kernel_ax3_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale, st2, lt):
    for p in range(2):
        sl = slice(p * st2, (p + 1) * st2)
        ar = xr_ref[0][:, sl, :].reshape(n1, n2, st2, lt)
        ai = xi_ref[0][:, sl, :].reshape(n1, n2, st2, lt)
        if n1 in pf._S1_CHAINS:
            br, bi = pf._vpu_dft_leading(ar, ai, n1, sign,
                                         pf._S1_CHAINS[n1])
        elif 2 * n1 <= 128:
            br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
        else:
            w1r, w1i = pf._gen_dft(n1, n1, n1, sign)
            br, bi = pf._cdot(w1r, w1r + w1i, w1i - w1r, ar, ai,
                              ((1,), (0,)))
        k = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st2), 0
                                     ).astype(jnp.float32)
        m = (jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st2), 1) // st2
             ).astype(jnp.float32)
        t = k * m
        r = t - n * jnp.floor(t / n)
        th = (sign * 2.0 * math.pi / n) * r
        twr = jnp.cos(th)[:, :, None]
        twi = jnp.sin(th)[:, :, None]
        b2r = br.reshape(n1, n2 * st2, lt)
        b2i = bi.reshape(n1, n2 * st2, lt)
        cr = (b2r * twr - b2i * twi).reshape(n1, n2, st2, lt)
        ci = (b2r * twi + b2i * twr).reshape(n1, n2, st2, lt)
        if 2 * n2 <= 128 and scale == 1.0:
            dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
        else:
            w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                              ((1,), (1,)))
        or_ref[0, :, sl, :] = dr.reshape(n, st2, lt)
        oi_ref[0, :, sl, :] = di.reshape(n, st2, lt)


def ax3_pipe(re, im, sign, scale=None, st=8):
    """st = block sub-tile; processed as two st/2 halves."""
    lead = re.shape[:-3]
    n, Y, Z = re.shape[-3:]
    b = int(np.prod(lead)) if lead else 1
    re4 = re.reshape(b, n, Y, Z)
    im4 = im.reshape(b, n, Y, Z)
    n1, n2 = pf._choose_split_sublane(n)
    kern = functools.partial(
        _kernel_ax3_pipe, n=n, n1=n1, n2=n2, sign=sign,
        scale=float(scale) if scale is not None else 1.0, st2=st // 2,
        lt=128)
    spec = pl.BlockSpec((1, n, st, 128), lambda i, j, l: (i, 0, j, l),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, Y // st, Z // 128),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, Y, Z), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re4, im4)
    return out[0].reshape(*lead, n, Y, Z), out[1].reshape(*lead, n, Y, Z)


# -------------------------------------------------------------- rows_t pipe
def _kernel_rows_t_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2,
                        sign, scale, bt, outer, factors):
    h = bt // 2
    for p in range(2):
        sl = slice(p * h, (p + 1) * h)
        ar = xr_ref[0][sl, :].T  # [n, h]
        ai = xi_ref[0][sl, :].T
        if outer is not None:
            _, outer_n = outer
            i = pl.program_id(1)
            ar, ai = pf._outer_tw_mul_rows_t(ar, ai, i * bt + p * h, n,
                                             outer_n, sign)
        ar = ar.reshape(n1, n2, h)
        ai = ai.reshape(n1, n2, h)
        br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, factors)
        itwr, itwi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * itwr[:, :, None] - bi * itwi[:, :, None]
        ci = br * itwi[:, :, None] + bi * itwr[:, :, None]
        if 2 * n2 <= 128:
            dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)),
                                      scale)
        else:
            w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                              ((1,), (1,)))
        or_ref[0, :, sl] = dr.reshape(n, h)
        oi_ref[0, :, sl] = di.reshape(n, h)


def rows_t_pipe(re, im, sign, scale=None, outer=None):
    n = re.shape[-1]
    R = re.shape[-2]
    lead = re.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    re3 = re.reshape(b, R, n)
    im3 = im.reshape(b, R, n)
    bt = 256
    n1, n2, factors = pf._BALANCED[n]
    kern = functools.partial(
        _kernel_rows_t_pipe, n=n, n1=n1, n2=n2, sign=sign,
        scale=float(scale) if scale is not None else 1.0, bt=bt,
        outer=outer, factors=factors)
    in_spec = pl.BlockSpec((1, bt, n), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, n, bt), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(R, bt)),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, R), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re3, im3)
    return out[0].reshape(*lead, n, R), out[1].reshape(*lead, n, R)


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

    def race(tag, f_prod, f_var, args, budget=600):
        try:
            fp = jax.jit(f_prod)
            op = fp(*args)
            _ = float(jnp.sum(op[0].ravel()[:4]))
            tp = _device_time(fp, args)
            signal.alarm(budget)
            fv = jax.jit(f_var)
            ov = fv(*args)
            _ = float(jnp.sum(ov[0].ravel()[:4]))
            signal.alarm(0)
            rel = rel_split(ov[0], ov[1], op[0], op[1])
            tv = _device_time(fv, args)
            print(f"{tag}: prod {tp*1e3:.3f} -> pipe {tv*1e3:.3f} ms "
                  f"(rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # P1. ax0 pipe
    for (b, n, m) in [(512, 512, 512), (4, 1024, 4096), (1, 4096, 4096),
                      (64, 256, 8192)]:
        re = jax.random.normal(jax.random.PRNGKey(0), (b, n, m),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (b, n, m),
                               jnp.float32)
        race(f"P1 ax0 [{b},{n},{m}]",
             lambda a, c: pf.fft_axis0_split(a, c, -1),
             lambda a, c: ax0_pipe(a, c, -1), (re, im))

    # P2. ax3 pipe at 512^3 (st=8 split in two, and st=16 split in two)
    re = jax.random.normal(jax.random.PRNGKey(2), (512, 512, 512),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(3), (512, 512, 512),
                           jnp.float32)
    race("P2 ax3 512^3 st=8 as 2x4",
         lambda a, c: pf.fft_axis3_split(a, c, -1),
         lambda a, c: ax3_pipe(a, c, -1, st=8), (re, im))
    race("P2 ax3 512^3 st=16 as 2x8",
         lambda a, c: pf.fft_axis3_split(a, c, -1),
         lambda a, c: ax3_pipe(a, c, -1, st=16), (re, im))
    del re, im

    # P3. rows_t pipe (four-step pass 2 shape and fft2 pass shape)
    n1o, n = 1024, 1 << 22
    r3 = jax.random.normal(jax.random.PRNGKey(4), (4, n1o, 4096),
                           jnp.float32)
    i3 = jax.random.normal(jax.random.PRNGKey(5), (4, n1o, 4096),
                           jnp.float32)
    race("P3 rows_t 4096 outer (four-step p2)",
         lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None,
                                                   outer=(n1o, n)),
         lambda a, c: rows_t_pipe(a, c, -1, None, outer=(n1o, n)),
         (r3, i3))
    race("P3 rows_t 4096 no-outer (fft2 pass)",
         lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None),
         lambda a, c: rows_t_pipe(a, c, -1, None), (r3, i3))
    del r3, i3
    for n2d in (512, 1024, 2048):
        re = jax.random.normal(jax.random.PRNGKey(6), (n2d, n2d),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(7), (n2d, n2d),
                               jnp.float32)
        race(f"P3 rows_t {n2d} no-outer",
             lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None),
             lambda a, c: rows_t_pipe(a, c, -1, None), (re, im))


if __name__ == "__main__" and "--extra" not in sys.argv:
    main()


def extra():
    """Follow-up: ax3 pipe at n=256 (the 256^3 axis pass), ax0 pipe at
    n=128, and ax3 st=32 as 2x16 at 512^3 (does the win keep growing?)."""
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    def race(tag, f_prod, f_var, args, budget=600):
        try:
            fp = jax.jit(f_prod)
            op = fp(*args)
            _ = float(jnp.sum(op[0].ravel()[:4]))
            tp = _device_time(fp, args)
            signal.alarm(budget)
            fv = jax.jit(f_var)
            ov = fv(*args)
            _ = float(jnp.sum(ov[0].ravel()[:4]))
            signal.alarm(0)
            rel = rel_split(ov[0], ov[1], op[0], op[1])
            tv = _device_time(fv, args)
            print(f"{tag}: prod {tp*1e3:.3f} -> pipe {tv*1e3:.3f} ms "
                  f"(rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    re = jax.random.normal(jax.random.PRNGKey(8), (256, 256, 256),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(9), (256, 256, 256),
                           jnp.float32)
    race("Q ax3 256^3 st=16 as 2x8",
         lambda a, c: pf.fft_axis3_split(a, c, -1),
         lambda a, c: ax3_pipe(a, c, -1, st=16), (re, im))
    del re, im
    re = jax.random.normal(jax.random.PRNGKey(10), (512, 512, 512),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(11), (512, 512, 512),
                           jnp.float32)
    race("Q ax3 512^3 st=32 as 2x16",
         lambda a, c: pf.fft_axis3_split(a, c, -1),
         lambda a, c: ax3_pipe(a, c, -1, st=32), (re, im))
    race("Q ax0 512^3 n=512 (repeat for noise)",
         lambda a, c: pf.fft_axis0_split(a, c, -1),
         lambda a, c: ax0_pipe(a, c, -1), (re, im))
    del re, im
    re = jax.random.normal(jax.random.PRNGKey(12), (64, 128, 16384),
                           jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(13), (64, 128, 16384),
                           jnp.float32)
    race("Q ax0 [64,128,16384]",
         lambda a, c: pf.fft_axis0_split(a, c, -1),
         lambda a, c: ax0_pipe(a, c, -1), (re, im))


if __name__ == "__main__" and "--extra" in sys.argv:
    extra()
