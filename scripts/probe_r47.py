#!/usr/bin/env python
"""Round-3 probe F/G (VERDICT item 5 + four-step pass-1).

F. Staggered strip-pipelined fused-plane fft2 for big square planes
   (A=B >= 512, outside the whole-plane fused envelope): row strips of
   plane p stream through a B-pass into a ping-pong VMEM scratch while
   plane p-1 gets its A-pass and a whole-plane output flush.  One HBM
   round trip for BOTH axes (the two-pass form pays two); targets
   512^3 <= 16 ms (currently 22.05 as three rows passes).

G. ax0-pipe: the axis(-2) kernel with a [1, n, 256] block processed as
   two interleaved 128-lane halves (the pipe2 win transplanted to the
   four-step's pass 1 / ND axis passes).

Run: nohup setsid python scripts/probe_r47.py > /tmp/probe_r47.out 2>&1 &
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


# --------------------------------------------------------------------- #
# F. staggered strip-pipelined fused plane
# --------------------------------------------------------------------- #
def _kernel_fft2_stag(xr_ref, xi_ref, or_ref, oi_ref, a0r, a0i, a1r, a1i,
                      *, A, B, S, P, sign, scale):
    p = pl.program_id(0)
    s = pl.program_id(1)

    # ---- B-pass: row strip [128, B] of plane min(p, P-1) ----
    ar = xr_ref[0].T  # [B, 128]
    ai = xi_ref[0].T
    br, bi = pf._dft_sublane_chain(ar, ai, B, sign, 1.0)  # [kb, 128]
    tr = br.T  # [128 a-rows, kb]
    ti = bi.T

    @pl.when((p % 2 == 0) & (p < P))
    def _():
        a0r[pl.ds(s * 128, 128), :] = tr
        a0i[pl.ds(s * 128, 128), :] = ti

    @pl.when((p % 2 == 1) & (p < P))
    def _():
        a1r[pl.ds(s * 128, 128), :] = tr
        a1i[pl.ds(s * 128, 128), :] = ti

    # ---- A-pass of the PREVIOUS plane's scratch, once per plane ----
    @pl.when((s == 0) & (p > 0) & (p % 2 == 1))
    def _():
        dr, di = pf._dft_sublane_chain(a0r[:], a0i[:], A, sign, scale)
        or_ref[0] = dr
        oi_ref[0] = di

    @pl.when((s == 0) & (p > 0) & (p % 2 == 0))
    def _():
        dr, di = pf._dft_sublane_chain(a1r[:], a1i[:], A, sign, scale)
        or_ref[0] = dr
        oi_ref[0] = di


def fft2_staggered(re, im, sign, scale=None, *, interpret=False):
    A, B = re.shape[-2], re.shape[-1]
    assert A % 128 == 0 and B >= 128
    lead = re.shape[:-2]
    P = int(np.prod(lead)) if lead else 1
    re3 = re.reshape(P, A, B)
    im3 = im.reshape(P, A, B)
    S = A // 128
    kern = functools.partial(_kernel_fft2_stag, A=A, B=B, S=S, P=P,
                             sign=sign,
                             scale=float(scale) if scale else 1.0)
    in_spec = pl.BlockSpec(
        (1, 128, B), lambda p, s: (jnp.minimum(p, P - 1), s, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (1, A, B), lambda p, s: (jnp.maximum(p - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    scr = [pltpu.VMEM((A, B), jnp.float32)] * 4
    return pl.pallas_call(
        kern, grid=(P + 1, S),
        in_specs=[in_spec, in_spec], out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((P, A, B), jnp.float32)] * 2,
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(re3, im3)


# --------------------------------------------------------------------- #
# G. ax0-pipe
# --------------------------------------------------------------------- #
def _kernel_ax0_pipe(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                     scale):
    for h in range(2):
        sl = slice(h * 128, (h + 1) * 128)
        ar = xr_ref[0, :, sl].reshape(n1, n2, 128)
        ai = xi_ref[0, :, sl].reshape(n1, n2, 128)
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
        or_ref[0, :, sl] = dr.reshape(n, 128)
        oi_ref[0, :, sl] = di.reshape(n, 128)


def ax0_pipe(re, im, sign):
    b, n, m = re.shape
    n1, n2 = pf._choose_split_sublane(n)
    kern = functools.partial(_kernel_ax0_pipe, n=n, n1=n1, n2=n2,
                             sign=sign, scale=1.0)
    spec = pl.BlockSpec((1, n, 256), lambda i, j: (i, 0, j),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(b, m // 256),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((b, n, m), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
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

    # ---- F: batched 512^2 planes ----
    P, A = 64, 512
    re = jax.random.normal(jax.random.PRNGKey(0), (P, A, A), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (P, A, A), jnp.float32)
    f2 = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))  # two-pass prod
    o2 = f2(re, im)
    _ = float(jnp.sum(o2[0][:1, :1, :2]))
    t2 = _device_time(f2, (re, im))
    print(f"F 512^2 x {P} two-pass: {t2*1e3:.3f} ms", flush=True)
    try:
        ff = jax.jit(lambda a, b: fft2_staggered(a, b, -1))
        tc = time.time()
        of = ff(re, im)
        _ = float(jnp.sum(of[0][:1, :1, :2]))
        comp = time.time() - tc
        rel = rel_split(of[0], of[1], o2[0], o2[1])
        tf = _device_time(ff, (re, im))
        print(f"F 512^2 x {P} staggered: {tf*1e3:.3f} ms (compile "
              f"{comp:.0f}s, rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"F staggered: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # whole-plane fused (outside its envelope) for reference
    try:
        fw = jax.jit(lambda a, b: pf._fft2_fused_core(a, b, -1))
        ow = fw(re, im)
        _ = float(jnp.sum(ow[0][:1, :1, :2]))
        rel = rel_split(ow[0], ow[1], o2[0], o2[1])
        tw = _device_time(fw, (re, im))
        print(f"F 512^2 x {P} whole-plane fused: {tw*1e3:.3f} ms "
              f"(rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"F whole-plane: FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

    # ---- F2: 1024^2 staggered (envelope extension) ----
    P2 = 16
    re2 = jax.random.normal(jax.random.PRNGKey(2), (P2, 1024, 1024),
                            jnp.float32)
    im2 = jax.random.normal(jax.random.PRNGKey(3), (P2, 1024, 1024),
                            jnp.float32)
    f2b = jax.jit(lambda a, b: pf.fft2_split(a, b, -1))
    o2b = f2b(re2, im2)
    _ = float(jnp.sum(o2b[0][:1, :1, :2]))
    t2b = _device_time(f2b, (re2, im2))
    print(f"F2 1024^2 x {P2} two-pass: {t2b*1e3:.3f} ms", flush=True)
    try:
        ffb = jax.jit(lambda a, b: fft2_staggered(a, b, -1))
        ofb = ffb(re2, im2)
        _ = float(jnp.sum(ofb[0][:1, :1, :2]))
        rel = rel_split(ofb[0], ofb[1], o2b[0], o2b[1])
        tfb = _device_time(ffb, (re2, im2))
        print(f"F2 1024^2 x {P2} staggered: {tfb*1e3:.3f} ms "
              f"(rel {rel:.2e})", flush=True)
    except Exception as e:
        print(f"F2 staggered: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)

    # ---- G: ax0-pipe at four-step pass-1 shapes ----
    for n, m in [(1024, 16384), (512, 32768)]:
        reg = jax.random.normal(jax.random.PRNGKey(4), (1, n, m),
                                jnp.float32)
        img = jax.random.normal(jax.random.PRNGKey(5), (1, n, m),
                                jnp.float32)
        f0 = jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1))
        o0 = f0(reg, img)
        _ = float(jnp.sum(o0[0][:1, :1, :2]))
        t0 = _device_time(f0, (reg, img))
        try:
            fg = jax.jit(lambda a, b: ax0_pipe(a, b, -1))
            og = fg(reg, img)
            _ = float(jnp.sum(og[0][:1, :1, :2]))
            rel = rel_split(og[0], og[1], o0[0], o0[1])
            tg = _device_time(fg, (reg, img))
            print(f"G ax0 n={n} m={m}: prod {t0*1e3:.3f} -> pipe "
                  f"{tg*1e3:.3f} ms (rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"G ax0 n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
