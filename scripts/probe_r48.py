#!/usr/bin/env python
"""Round-3 probe H (VERDICT item 5): true axis-(-3) kernel.

The 512^3 leading-axis pass currently flattens [X, Y, Z] -> [X, Y*Z]
for the ax0 kernel — a minor-dim merge that is a PHYSICAL relayout
(measured: the "ax0 leading" step costs 12.4 ms of which ~7.7 is the
relayout; the kernel itself is 4.7).  This kernel reads [X, st, 128]
blocks directly from the rank-3 array (contiguous (st,128) tiles at
stride Y*Z — st*512-byte DMA bursts) and runs the sublane chain over
the LEADING axis with a rank-2 rest — zero relayouts.

Run: nohup setsid python scripts/probe_r48.py > /tmp/probe_r48.out 2>&1 &
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

from fft_wgpu_tpu.ops import pallas_fft as pf


def _kernel_ax3(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                scale, st, lt):
    ar = xr_ref[:].reshape(n1, n2, st, lt)
    ai = xi_ref[:].reshape(n1, n2, st, lt)
    if n1 in pf._S1_CHAINS:
        br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, pf._S1_CHAINS[n1])
    else:
        br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None, None] - bi * twi[:, :, None, None]
    ci = br * twi[:, :, None, None] + bi * twr[:, :, None, None]
    if 2 * n2 <= 128 and scale == 1.0:
        dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
    else:
        w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
        dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[:] = dr.reshape(n, st, lt)
    oi_ref[:] = di.reshape(n, st, lt)


def fft_ax3(re, im, sign, scale=None, *, st=8, interpret=False):
    n, Y, Z = re.shape[-3], re.shape[-2], re.shape[-1]
    lt = 128
    n1, n2 = pf._choose_split_sublane(n)
    kern = functools.partial(_kernel_ax3, n=n, n1=n1, n2=n2, sign=sign,
                             scale=float(scale) if scale else 1.0,
                             st=st, lt=lt)
    spec = pl.BlockSpec((n, st, lt), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(Y // st, Z // lt),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, Y, Z), jnp.float32)] * 2,
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
    from fft_wgpu_tpu.plan.plan import get_plan
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    n = 512
    re = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (n, n, n), jnp.float32)

    # current route: flatten + ax0 (incl. the relayout)
    f0 = jax.jit(lambda a, b: get_plan(n, "auto")._execute_split_axis(
        a, b, -1, None, 0))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:1, :1, :2]))
    t0 = _device_time(f0, (re, im))
    print(f"H ax0-leading current (flatten+relayout): {t0*1e3:.3f} ms",
          flush=True)

    for st in (8, 32, 64):
        try:
            fh = jax.jit(lambda a, b, _st=st: fft_ax3(a, b, -1, st=_st))
            tc = time.time()
            oh = fh(re, im)
            _ = float(jnp.sum(oh[0][:1, :1, :2]))
            comp = time.time() - tc
            rel = rel_split(oh[0], oh[1], o0[0], o0[1])
            th = _device_time(fh, (re, im))
            print(f"H ax3 st={st}: {th*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"H ax3 st={st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # full 3-D: fft2_split trailing + ax3 leading
    def full(a, b):
        a, b = pf.fft2_split(a, b, -1, None)
        return fft_ax3(a, b, -1, st=32)

    try:
        ff = jax.jit(full)
        of = ff(re, im)
        _ = float(jnp.sum(of[0][:1, :1, :2]))
        from fft_wgpu_tpu.ops.nd import fftn_split
        fr = jax.jit(lambda a, b: fftn_split(a, b, (0, 1, 2), -1, None))
        orr = fr(re, im)
        rel = rel_split(of[0], of[1], orr[0], orr[1])
        tf = _device_time(ff, (re, im))
        print(f"H fftn 512^3 fft2_split+ax3: {tf*1e3:.3f} ms "
              f"(rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"H full 512^3: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # 256^3 comparison (current fused-plane route = 2.592 ms)
    n2_ = 256
    re2 = jax.random.normal(jax.random.PRNGKey(2), (n2_,) * 3, jnp.float32)
    im2 = jax.random.normal(jax.random.PRNGKey(3), (n2_,) * 3, jnp.float32)
    from fft_wgpu_tpu.ops.nd import fftn_split
    f2 = jax.jit(lambda a, b: fftn_split(a, b, (0, 1, 2), -1, None))
    o2 = f2(re2, im2)
    _ = float(jnp.sum(o2[0][:1, :1, :2]))
    t2 = _device_time(f2, (re2, im2))
    print(f"H fftn 256^3 current: {t2*1e3:.3f} ms", flush=True)

    def full2(a, b):
        a, b = pf.fft2_fused_split(a, b, -1, None)
        return fft_ax3(a, b, -1, st=32)

    try:
        ff2 = jax.jit(full2)
        of2 = ff2(re2, im2)
        _ = float(jnp.sum(of2[0][:1, :1, :2]))
        rel = rel_split(of2[0], of2[1], o2[0], o2[1])
        tf2 = _device_time(ff2, (re2, im2))
        print(f"H fftn 256^3 fused+ax3: {tf2*1e3:.3f} ms (rel {rel:.2e})",
              flush=True)
    except Exception as e:
        print(f"H 256^3 fused+ax3: FAILED {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)




# Variant B: static python loop over the st slices — every intermediate
# rank-3 (the proven _kernel_ax0 pattern); the (n, st, lt) block still
# gives (st*512)-byte DMA bursts.
def _kernel_ax3b(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                 scale, st, lt):
    for s in range(st):
        ar = xr_ref[:, s, :].reshape(n1, n2, lt)
        ai = xi_ref[:, s, :].reshape(n1, n2, lt)
        if n1 in pf._S1_CHAINS:
            br, bi = pf._vpu_dft_leading(ar, ai, n1, sign,
                                         pf._S1_CHAINS[n1])
        else:
            br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
        twr, twi = pf._gen_twiddle(n1, n2, n, sign)
        cr = br * twr[:, :, None] - bi * twi[:, :, None]
        ci = br * twi[:, :, None] + bi * twr[:, :, None]
        if 2 * n2 <= 128 and scale == 1.0:
            dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
        else:
            w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
            dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci,
                              ((1,), (1,)))
        or_ref[:, s, :] = dr.reshape(n, lt)
        oi_ref[:, s, :] = di.reshape(n, lt)


def fft_ax3b(re, im, sign, scale=None, *, st=8, interpret=False):
    n, Y, Z = re.shape[-3], re.shape[-2], re.shape[-1]
    lt = 128
    n1, n2 = pf._choose_split_sublane(n)
    kern = functools.partial(_kernel_ax3b, n=n, n1=n1, n2=n2, sign=sign,
                             scale=float(scale) if scale else 1.0,
                             st=st, lt=lt)
    spec = pl.BlockSpec((n, st, lt), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(Y // st, Z // lt),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, Y, Z), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(re, im)


def main_b():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    n = 512
    re = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (n, n, n), jnp.float32)
    from fft_wgpu_tpu.plan.plan import get_plan
    f0 = jax.jit(lambda a, b: get_plan(n, "auto")._execute_split_axis(
        a, b, -1, None, 0))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:1, :1, :2]))
    for st in (8, 16):
        try:
            fh = jax.jit(lambda a, b, _st=st: fft_ax3b(a, b, -1, st=_st))
            tc = time.time()
            oh = fh(re, im)
            _ = float(jnp.sum(oh[0][:1, :1, :2]))
            comp = time.time() - tc
            rel = rel_split(oh[0], oh[1], o0[0], o0[1])
            th = _device_time(fh, (re, im))
            print(f"H2 ax3b st={st}: {th*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"H2 ax3b st={st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)




# Variant C: rank-4 chain + dots (proven in bigfft), with the inter-
# factor twiddle applied on a MERGED [n1, n2*st, 128] view against a
# 2-D iota table broadcast [:, :, None] (the production-proven
# trailing-unit-lane pattern) — no (.., 1, 1) unit-lane broadcasts.
def _kernel_ax3c(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                 scale, st, lt):
    ar = xr_ref[:].reshape(n1, n2, st, lt)
    ai = xi_ref[:].reshape(n1, n2, st, lt)
    if n1 in pf._S1_CHAINS:
        br, bi = pf._vpu_dft_leading(ar, ai, n1, sign, pf._S1_CHAINS[n1])
    else:
        br, bi = pf._cdot_realcat(n1, sign, ar, ai, 0, ((1,), (0,)))
    # twiddle w_n^{k1 m2} on the merged [n1, n2*st, lt] view: table value
    # depends on (k1, idx // st) only — 2-D iota, rank-3 broadcast
    k = jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st), 0
                                 ).astype(jnp.float32)
    m = (jax.lax.broadcasted_iota(jnp.int32, (n1, n2 * st), 1) // st
         ).astype(jnp.float32)
    t = k * m
    r = t - n * jnp.floor(t / n)
    th = (sign * 2.0 * jnp.pi / n) * r
    twr = jnp.cos(th)[:, :, None]
    twi = jnp.sin(th)[:, :, None]
    b2r = br.reshape(n1, n2 * st, lt)
    b2i = bi.reshape(n1, n2 * st, lt)
    cr = (b2r * twr - b2i * twi).reshape(n1, n2, st, lt)
    ci = (b2r * twi + b2i * twr).reshape(n1, n2, st, lt)
    if 2 * n2 <= 128 and scale == 1.0:
        dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
    else:
        w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
        dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[:] = dr.reshape(n, st, lt)
    oi_ref[:] = di.reshape(n, st, lt)


def fft_ax3c(re, im, sign, scale=None, *, st=8, interpret=False):
    n, Y, Z = re.shape[-3], re.shape[-2], re.shape[-1]
    lt = 128
    n1, n2 = pf._choose_split_sublane(n)
    kern = functools.partial(_kernel_ax3c, n=n, n1=n1, n2=n2, sign=sign,
                             scale=float(scale) if scale else 1.0,
                             st=st, lt=lt)
    spec = pl.BlockSpec((n, st, lt), lambda i, j: (0, i, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(Y // st, Z // lt),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n, Y, Z), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(re, im)


def main_c():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    n = 512
    re = jax.random.normal(jax.random.PRNGKey(0), (n, n, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (n, n, n), jnp.float32)
    from fft_wgpu_tpu.plan.plan import get_plan
    f0 = jax.jit(lambda a, b: get_plan(n, "auto")._execute_split_axis(
        a, b, -1, None, 0))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:1, :1, :2]))
    for st in (8, 32):
        try:
            fh = jax.jit(lambda a, b, _st=st: fft_ax3c(a, b, -1, st=_st))
            tc = time.time()
            oh = fh(re, im)
            _ = float(jnp.sum(oh[0][:1, :1, :2]))
            comp = time.time() - tc
            rel = rel_split(oh[0], oh[1], o0[0], o0[1])
            th = _device_time(fh, (re, im))
            print(f"H3 ax3c st={st}: {th*1e3:.3f} ms (compile {comp:.0f}s, "
                  f"rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"H3 ax3c st={st}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    import os
    if os.environ.get("R48_C"):
        main_c()
    elif os.environ.get("R48_B"):
        main_b()
    else:
        main()
