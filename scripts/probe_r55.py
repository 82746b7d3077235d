#!/usr/bin/env python
"""Round-3 probe R: pipe2 for the balanced R2C / C2R rows kernels.

The row-kernel pipe2 (256-row block as two independent 128-row halves;
chain/dot overlap) won 1.6-20% at n <= 4096.  The balanced R2C and C2R
kernels have the same chain+dot structure, so the same form should pay
on the real transforms (BASELINE config 4).  Measured against the
PADDED serving forms (the production fast path).

Run: nohup setsid python scripts/probe_r55.py > /tmp/probe_r55.out 2>&1 &
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


def _kernel_r2c_pipe(xr_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
                     mp, mp_out, factors):
    bt = xr_ref.shape[0]
    h = bt // 2
    for p in range(2):
        sl = slice(p * h, (p + 1) * h)
        ar = xr_ref[sl, :].T.reshape(n1, n2, h)
        br, bi = pf._vpu_dft_leading_real(ar, n1, sign, factors)
        twr, twi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        k2_rows = pf._round_up(mp // n1 + 1, 8)
        w2r, w2i = pf._gen_dft(k2_rows, n2, n2, sign, scale)
        wbig = jnp.concatenate(
            [jnp.concatenate([w2r, -w2i], axis=1),
             jnp.concatenate([w2i, w2r], axis=1)], axis=0)
        xcat = jnp.concatenate([cr, ci], axis=1)
        res = jax.lax.dot_general(
            wbig, xcat, ((((1,), (1,))), ((), ())),
            precision=pf._MM_PREC, preferred_element_type=jnp.float32)
        dr = res[:k2_rows].reshape(k2_rows * n1, h)
        di = res[k2_rows:].reshape(k2_rows * n1, h)
        if dr.shape[0] < mp_out:
            z = jnp.zeros((mp_out - dr.shape[0], h), jnp.float32)
            dr = jnp.concatenate([dr, z], axis=0)
            di = jnp.concatenate([di, z], axis=0)
        else:
            dr = dr[:mp_out]
            di = di[:mp_out]
        if mp_out > mp:
            keep = (jax.lax.broadcasted_iota(jnp.int32, (mp_out, h), 0)
                    < mp).astype(jnp.float32)
            dr = dr * keep
            di = di * keep
        or_ref[sl, :] = dr.T
        oi_ref[sl, :] = di.T


def r2c_pipe(xr, scale=None, pad_out=True):
    n = xr.shape[-1]
    lead = xr.shape[:-1]
    rows = int(np.prod(lead))
    m_out = n // 2 + 1
    mp_out = pf.pad_bins(n) if pad_out else m_out
    x2 = xr.reshape(rows, n)
    bt = 256
    n1, n2, factors = pf._BALANCED_R2C[n]
    kern = functools.partial(
        _kernel_r2c_pipe, n=n, n1=n1, n2=n2, sign=-1,
        scale=float(scale) if scale is not None else 1.0, mp=m_out,
        mp_out=mp_out, factors=factors)
    in_spec = pl.BlockSpec((bt, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, mp_out), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, bt),),
        in_specs=[in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, mp_out), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(x2)
    return out_r.reshape(*lead, mp_out), out_i.reshape(*lead, mp_out)


def _kernel_c2r_pipe(xr_ref, xi_ref, o_ref, *, n, n1, n2, scale, factors):
    bt = xr_ref.shape[0]
    hh = bt // 2
    h = n // 2
    rows_in = (n1 // 2 + 1) * n2
    for p in range(2):
        sl = slice(p * hh, (p + 1) * hh)
        ar = xr_ref[sl, :].T  # [mp, hh]
        ai = xi_ref[sl, :].T
        ri = jax.lax.broadcasted_iota(jnp.int32, ar.shape, 0)
        ends = (ri == 0) | (ri == h)
        ar = ar * jnp.where(ri > h, 0.0,
                            jnp.where(ends, 0.5, 1.0)).astype(jnp.float32)
        ai = ai * ((ri > 0) & (ri < h)).astype(jnp.float32)
        xr = ar[:rows_in].reshape(n1 // 2 + 1, n2, hh)
        xi = ai[:rows_in].reshape(n1 // 2 + 1, n2, hh)
        z = jnp.zeros((n1 - (n1 // 2 + 1), n2, hh), jnp.float32)
        yr, yi = pf._vpu_dft_leading(
            jnp.concatenate([xr, z], axis=0),
            jnp.concatenate([xi, z], axis=0), n1, +1, factors)
        twr, twi = pf._gen_twiddle(n1, n2, n, +1)
        zr = yr * twr[:, :, None] - yi * twi[:, :, None]
        zi = yr * twi[:, :, None] + yi * twr[:, :, None]
        wbr, wbi = pf._gen_dft(n2, n2, n2, +1, 2.0 * scale)
        wcat = jnp.concatenate([wbr, -wbi], axis=1)
        zcat = jnp.concatenate([zr, zi], axis=1)
        out = jax.lax.dot_general(
            wcat, zcat, ((((1,), (1,))), ((), ())),
            precision=pf._MM_PREC, preferred_element_type=jnp.float32)
        o_ref[sl, :] = out.reshape(n, hh).T


def c2r_pipe(Xr, Xi, n, scale):
    bins = pf.pad_bins(n)
    lead = Xr.shape[:-1]
    rows = int(np.prod(lead))
    mp_in = pf._round_up(bins, 128)
    Xr2 = Xr.reshape(rows, mp_in)
    Xi2 = Xi.reshape(rows, mp_in)
    bt = 256
    ent = pf._BALANCED_C2R[n]
    n1, n2, factors = ent[0], ent[1], ent[2]
    kern = functools.partial(_kernel_c2r_pipe, n=n, n1=n1, n2=n2,
                             scale=float(scale), factors=factors)
    in_spec = pl.BlockSpec((bt, mp_in), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((bt, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        grid=(pl.cdiv(rows, bt),),
        in_specs=[in_spec, in_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((rows, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(Xr2, Xi2)
    return out.reshape(*lead, n)


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    def rel2(a, b):
        return float(jax.jit(lambda a, b: jnp.sqrt(
            jnp.sum((a - b) ** 2) / jnp.sum(b ** 2)))(a, b))

    # ---- R. R2C pipe (padded serving form) ----
    for n, rows in [(512, 4096), (1024, 4096), (2048, 4096), (4096, 4096),
                    (8192, 2048)]:
        x = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        try:
            f0 = jax.jit(lambda v: pf.rfft_rows_split(v, None,
                                                      pad_out=True))
            o0 = f0(x)
            _ = float(jnp.sum(o0[0][:2, :2]))
            t0 = _device_time(f0, (x,))
            signal.alarm(900)
            fb = jax.jit(lambda v: r2c_pipe(v, None, pad_out=True))
            ob = fb(x)
            _ = float(jnp.sum(ob[0][:2, :2]))
            signal.alarm(0)
            rel = max(rel2(ob[0], o0[0]), rel2(ob[1], o0[1]))
            tb = _device_time(fb, (x,))
            print(f"R r2c n={n} x {rows}: prod {t0*1e3:.3f} -> pipe "
                  f"{tb*1e3:.3f} ms (rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"R r2c n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)

    # ---- S. C2R pipe (padded-in serving form) ----
    for n, rows in [(512, 4096), (1024, 4096), (2048, 4096), (4096, 4096),
                    (8192, 2048)]:
        bins = pf.pad_bins(n)
        nb = n // 2 + 1
        Xr = jax.random.normal(jax.random.PRNGKey(1), (rows, bins),
                               jnp.float32)
        Xi = jax.random.normal(jax.random.PRNGKey(2), (rows, bins),
                               jnp.float32)
        ri = jnp.arange(bins)
        Xr = Xr * (ri < nb)
        Xi = Xi * (ri < nb)
        try:
            f0 = jax.jit(lambda a, b: (pf.irfft_rows_split(
                a, b, n, 1.0 / n, padded_in=True),))
            o0 = f0(Xr, Xi)
            _ = float(jnp.sum(o0[0][:2, :2]))
            t0 = _device_time(f0, (Xr, Xi))
            signal.alarm(900)
            fb = jax.jit(lambda a, b: (c2r_pipe(a, b, n, 1.0 / n),))
            ob = fb(Xr, Xi)
            _ = float(jnp.sum(ob[0][:2, :2]))
            signal.alarm(0)
            rel = rel2(ob[0], o0[0])
            tb = _device_time(fb, (Xr, Xi))
            print(f"S c2r n={n} x {rows}: prod {t0*1e3:.3f} -> pipe "
                  f"{tb*1e3:.3f} ms (rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"S c2r n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
