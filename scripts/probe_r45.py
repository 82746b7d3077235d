#!/usr/bin/env python
"""Round-3 probe A/B (VERDICT items 1 and 2).

A. Cross-tile MXU/VPU software pipelining for the headline balanced row
   kernel (n=4096 x 4096): process a 256-row block as two 128-row halves
   so half B's VPU chain can overlap half A's full-rate realcat dot —
   distinct from the failed within-tile m2-half-split (those half-K dots
   paid MXU fill penalties; these are full dots on independent data).
   Variants: order cA,dA,cB,dB vs cA,cB,dA,dB, plus the bt=256
   single-pass control (known ~0.676 from round-2e).

B. Real-transform IO hypothesis: the R2C output (and C2R input) blocks
   are 2049 lanes — a ragged minor that breaks HBM stride alignment for
   every row, and C2R additionally pays an explicit jnp.pad pass to
   2176.  Measure (i) production R2C, (ii) R2C writing a PADDED [bt,
   2176] block (garbage tail columns), (iii) padded + XLA slice back to
   2049 (the API-boundary cost), (iv) production C2R (with pad pass),
   (v) C2R fed an already-padded input (kernel-only).

Run: nohup setsid python scripts/probe_r45.py > /tmp/probe_r45.out 2>&1 &
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
from fft_wgpu_tpu.ops import pallas_fft as pf


# --------------------------------------------------------------------- #
# A. cross-tile pipelined balanced rows kernel
# --------------------------------------------------------------------- #
def _kernel_rows_bal_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2,
                          sign, scale, factors, halves, order):
    bt = xr_ref.shape[0]
    h = bt // halves
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    wr, wi = pf._gen_dft(n2, n2, n2, sign, scale)
    wbig = jnp.concatenate(
        [jnp.concatenate([wr, -wi], axis=1),
         jnp.concatenate([wi, wr], axis=1)], axis=0)

    def chain(p):
        ar = xr_ref[p * h:(p + 1) * h, :].T.reshape(n1, n2, h)
        ai = xi_ref[p * h:(p + 1) * h, :].T.reshape(n1, n2, h)
        br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, factors)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        return jnp.concatenate([cr, ci], axis=1)

    def dot(xcat, p):
        res = jax.lax.dot_general(
            wbig, xcat, ((((1,), (1,))), ((), ())), precision=pf._MM_PREC,
            preferred_element_type=jnp.float32)
        dr, di = res[:n2], res[n2:]
        or_ref[p * h:(p + 1) * h, :] = dr.reshape(n, h).T
        oi_ref[p * h:(p + 1) * h, :] = di.reshape(n, h).T

    if order == "cdcd":  # chain A, dot A, chain B, dot B (scheduler overlap)
        for p in range(halves):
            dot(chain(p), p)
    else:  # "ccdd": all chains first, then all dots
        cats = [chain(p) for p in range(halves)]
        for p in range(halves):
            dot(cats[p], p)


def rows_bal_pipe(re, im, sign, bt, halves, order):
    n = re.shape[-1]
    rows = re.shape[0]
    n1, n2, factors = pf._BALANCED[n]
    kern = functools.partial(
        _kernel_rows_bal_pipe, n=n, n1=n1, n2=n2, sign=sign, scale=1.0,
        factors=factors, halves=halves, order=order)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


# --------------------------------------------------------------------- #
# B. padded-output R2C / padded-input C2R
# --------------------------------------------------------------------- #
def _round_up(v, m):
    return -(-v // m) * m


def _kernel_r2c_pad(xr_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                    mp, factors):
    """_kernel_r2c_bal writing a padded [bt, mp_pad] block (mp_pad a lane
    multiple; columns beyond mp are garbage the caller never reads)."""
    bt = xr_ref.shape[0]
    mp_pad = or_ref.shape[1]
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    br, bi = pf._vpu_dft_leading_real(ar, n1, sign, factors)
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    k2_rows = _round_up(mp // n1 + 1, 8)
    w2r, w2i = pf._gen_dft(k2_rows, n2, n2, sign, scale)
    wbig = jnp.concatenate(
        [jnp.concatenate([w2r, -w2i], axis=1),
         jnp.concatenate([w2i, w2r], axis=1)], axis=0)
    xcat = jnp.concatenate([cr, ci], axis=1)
    res = jax.lax.dot_general(
        wbig, xcat, ((((1,), (1,))), ((), ())), precision=pf._MM_PREC,
        preferred_element_type=jnp.float32)
    dr, di = res[:k2_rows], res[k2_rows:]
    pad_rows = mp_pad - k2_rows * n1
    fr = dr.reshape(k2_rows * n1, bt)
    fi = di.reshape(k2_rows * n1, bt)
    if pad_rows > 0:
        z = jnp.zeros((pad_rows, bt), jnp.float32)
        fr = jnp.concatenate([fr, z], axis=0)
        fi = jnp.concatenate([fi, z], axis=0)
    else:
        fr = fr[:mp_pad]
        fi = fi[:mp_pad]
    or_ref[:] = fr.T
    oi_ref[:] = fi.T


def rfft_padded(xr, *, slice_out):
    n = xr.shape[-1]
    rows = xr.shape[0]
    n1, n2, factors = pf._BALANCED_R2C[n]
    mp = n // 2 + 1
    mp_pad = _round_up(mp, 128)
    bt = 128
    kern = functools.partial(
        _kernel_r2c_pad, n=n, n1=n1, n2=n2, sign=-1, scale=1.0, mp=mp,
        factors=factors)
    in_spec = pl.BlockSpec((bt, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, mp_pad), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[in_spec], out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, mp_pad), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(xr)
    if slice_out:
        return out_r[:, :mp], out_i[:, :mp]
    return out_r, out_i


def rel_split(a, b, c, d):
    return float(jax.jit(
        lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2)))
    )(a, b, c, d))


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    rows, n = 4096, 4096
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)

    # ---- A. headline pipelining ----
    f0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                   schedule="balanced"))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:2, :2]))
    t0 = _device_time(f0, (re, im))
    print(f"A prod balanced 4096: {t0*1e3:.3f} ms", flush=True)

    for bt, halves, order, tag in [
        (256, 1, "cdcd", "seq256 control"),
        (256, 2, "cdcd", "pipe2 cdcd"),
        (256, 2, "ccdd", "pipe2 ccdd"),
        (512, 4, "cdcd", "pipe4 cdcd"),
    ]:
        try:
            fb = jax.jit(lambda a, b, _bt=bt, _h=halves, _o=order:
                         rows_bal_pipe(a, b, -1, _bt, _h, _o))
            tc = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"A {tag}: {tb*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"A {tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    # ---- B. R2C padded output ----
    xr = jax.random.normal(jax.random.PRNGKey(2), (rows, n), jnp.float32)
    fr0 = jax.jit(lambda a: pf.rfft_rows_split(a))
    or0 = fr0(xr)
    _ = float(jnp.sum(or0[0][:2, :2]))
    tr0 = _device_time(fr0, (xr,))
    print(f"B prod R2C 4096: {tr0*1e3:.3f} ms", flush=True)

    for slice_out, tag in [(False, "padded-out"), (True, "padded+slice")]:
        try:
            fb = jax.jit(lambda a, _s=slice_out: rfft_padded(a, slice_out=_s))
            tc = time.time()
            ob = fb(xr)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            mp = n // 2 + 1
            rel = rel_split(ob[0][:, :mp], ob[1][:, :mp], or0[0], or0[1])
            tb = _device_time(fb, (xr,))
            print(f"B R2C {tag}: {tb*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"B R2C {tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # ---- B2. C2R: production (with pad pass) vs pre-padded input ----
    mp = n // 2 + 1
    Xr = jax.random.normal(jax.random.PRNGKey(3), (rows, mp), jnp.float32)
    Xi = jax.random.normal(jax.random.PRNGKey(4), (rows, mp), jnp.float32)
    fc0 = jax.jit(lambda a, b: pf.irfft_rows_split(a, b, n))
    oc0 = fc0(Xr, Xi)
    _ = float(jnp.sum(oc0[:2, :2]))
    tc0 = _device_time(fc0, (Xr, Xi))
    print(f"B2 prod C2R 4096: {tc0*1e3:.3f} ms", flush=True)

    mp_pad = _round_up(mp, 128)
    Xrp = jnp.pad(Xr, ((0, 0), (0, mp_pad - mp)))
    Xip = jnp.pad(Xi, ((0, 0), (0, mp_pad - mp)))

    # kernel-only: call the core with input already at the padded width
    def c2r_prepadded(a, b):
        ent = pf._BALANCED_C2R[n]
        n1, n2 = ent[0], ent[1]
        factors = ent[2] if len(ent) > 2 else None
        kern = functools.partial(pf._kernel_c2r_bal, n=n, n1=n1, n2=n2,
                                 scale=1.0, factors=factors)
        bt = 128
        in_spec = pl.BlockSpec((bt, mp_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((bt, n), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(pl.cdiv(a.shape[0], bt),),
            in_specs=[in_spec, in_spec], out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((a.shape[0], n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(a, b)

    try:
        fb = jax.jit(c2r_prepadded)
        tc = time.time()
        ob = fb(Xrp, Xip)
        _ = float(jnp.sum(ob[:2, :2]))
        comp = time.time() - tc
        rel = float(jax.jit(lambda a, c: jnp.sqrt(
            jnp.sum((a - c) ** 2) / jnp.sum(c ** 2)))(ob, oc0))
        tb = _device_time(fb, (Xrp, Xip))
        print(f"B2 C2R pre-padded kernel-only: {tb*1e3:.3f} ms "
              f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"B2 C2R pre-padded: FAILED {type(e).__name__}: "
              f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
