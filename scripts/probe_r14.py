#!/usr/bin/env python
"""Round-2b probe: cheaper VPU stage-1 chains for the balanced row kernel.

probe_r13's W kernel (balanced split, VPU stage-1) leaves ~9 us/step of
exposed VPU time at n=4096.  f=8 butterflies cost ~3 ops/term (sqrt2
rotations); f=4/f=2 butterflies are pure adds.  Candidates for n1=64:
(8,8) [baseline W], (4,4,4), (2,4,8), (4,16->no).  Also n1=32: (4,8) vs
(2,4,4)/(4,4,2).

Generalized L-stage chain with scalar twiddles (this file; promoted to
pallas_fft._vpu_dft_leading if it wins).

Run: nohup setsid python scripts/probe_r14.py > /tmp/probe_r14.out 2>&1 &
"""
from __future__ import annotations

import functools
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _device_time
from fft_wgpu_tpu.ops import pallas_fft as pf


def _twiddle_slices_2d(br, bi, f, B, block, sign):
    """Multiply [k, m, ...] by w_block^(k*m) via per-(k,m) scalar consts."""
    rows_r, rows_i = [], []
    for k in range(f):
        cols_r, cols_i = [], []
        for m in range(B):
            vr, vi = br[k, m], bi[k, m]
            if k * m % block:
                c = math.cos(sign * 2.0 * math.pi * k * m / block)
                s = math.sin(sign * 2.0 * math.pi * k * m / block)
                vr, vi = c * vr - s * vi, c * vi + s * vr
            cols_r.append(vr[None])
            cols_i.append(vi[None])
        rows_r.append(jnp.concatenate(cols_r, 0)[None])
        rows_i.append(jnp.concatenate(cols_i, 0)[None])
    return jnp.concatenate(rows_r, 0), jnp.concatenate(rows_i, 0)


def _vpu_chain(xr, xi, S, sign, factors):
    """DFT of size S over the leading axis, natural output order, L VPU
    stages with scalar inter-stage twiddles.  State: [K..., B, rest] kept
    flat as [S, rest]; every stage contracts the current major digit."""
    rest = xr.shape[1:]
    K, B = 1, S
    for j, f in enumerate(factors):
        B //= f
        block = f * B
        if K == 1:
            xr = xr.reshape(f, B, *rest) if B > 1 else xr.reshape(f, *rest)
            xi = xi.reshape(f, B, *rest) if B > 1 else xi.reshape(f, *rest)
            br, bi = pf._stage_dft(xr, xi, f, 0, sign, 1.0)  # [k, (B,) rest]
            if B > 1:
                br, bi = _twiddle_slices_2d(br, bi, f, B, block, sign)
                # flatten [k, B] -> new leading; k becomes a SPECTATOR digit
                # group: state [k*B + m, rest], recurse on m within each k
        else:
            # state [K, f*B, rest] where K = accumulated k digits (minor
            # output digits).  Contract this block's major digit f.
            if B > 1:
                xr = xr.reshape(K, f, B, *rest)
                xi = xi.reshape(K, f, B, *rest)
                br, bi = pf._stage_dft(xr, xi, f, 1, sign, 1.0)
                # [k_f, K, B, rest]; twiddle w_block^(k_f*m) over (dim0, dim2)
                rows_r, rows_i = [], []
                for k in range(f):
                    cols_r, cols_i = [], []
                    for m in range(B):
                        vr, vi = br[k, :, m], bi[k, :, m]
                        if k * m % block:
                            c = math.cos(sign * 2.0 * math.pi * k * m / block)
                            s = math.sin(sign * 2.0 * math.pi * k * m / block)
                            vr, vi = c * vr - s * vi, c * vi + s * vr
                        cols_r.append(vr[:, None])
                        cols_i.append(vi[:, None])
                    rows_r.append(jnp.concatenate(cols_r, 1)[None])
                    rows_i.append(jnp.concatenate(cols_i, 1)[None])
                br = jnp.concatenate(rows_r, 0)  # [k_f, K, B, rest]
                bi = jnp.concatenate(rows_i, 0)
            else:
                xr = xr.reshape(K, f, *rest)
                xi = xi.reshape(K, f, *rest)
                br, bi = pf._stage_dft(xr, xi, f, 1, sign, 1.0)  # [k_f,K,rest]
        K *= f
        xr = br.reshape(K * B, *rest) if B > 1 else br.reshape(K, *rest)
        xi = bi.reshape(K * B, *rest) if B > 1 else bi.reshape(K, *rest)
        # NOTE state order after stage j: [k_j, k_{j-1}, .., k_1, m_B]
    return xr, xi


def _kernel_w2(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign, scale,
               factors):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    ai = xi_ref[:].T.reshape(n1, n2, bt)
    br, bi = _vpu_chain(ar, ai, n1, sign, factors)
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    cr = br * twr[:, :, None] - bi * twi[:, :, None]
    ci = br * twi[:, :, None] + bi * twr[:, :, None]
    if 2 * n2 <= 128:
        dr, di = pf._cdot_realcat(n2, sign, cr, ci, 1, ((1,), (1,)))
        if scale != 1.0:
            dr, di = dr * scale, di * scale
    else:
        w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
        dr, di = pf._cdot(w2r, w2r + w2i, w2i - w2r, cr, ci, ((1,), (1,)))
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_w2(re, im, n1, n2, factors, sign=-1):
    rows, n = re.shape
    bt = 128
    kern = functools.partial(_kernel_w2, n=n, n1=n1, n2=n2, sign=sign,
                             scale=1.0, factors=factors)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


CASES = [
    # rows, n, n1, n2, factors
    (4096, 4096, 64, 64, (8, 8)),      # r13 baseline
    (4096, 4096, 64, 64, (4, 4, 4)),
    (4096, 4096, 64, 64, (2, 4, 8)),
    (4096, 4096, 64, 64, (4, 16)),     # f=16 via _stage_dft realcat (K=32)
    (4096, 4096, 32, 128, (4, 8)),     # lane-ish split but transposed
    (2048, 2048, 32, 64, (4, 4, 2)),
    (2048, 2048, 32, 64, (2, 4, 4)),
    (1024, 8192, 64, 128, (4, 4, 4)),
]


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    ref_cache = {}
    for rows, n, n1, n2, factors in CASES:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        if (rows, n) not in ref_cache:
            fA = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
            oA = fA(re, im)
            _ = float(jnp.sum(oA[0][:2, :2]))
            tA = _device_time(fA, (re, im))
            ref_cache[(rows, n)] = (oA, tA)
            print(f"{rows}x{n}: A={tA*1e3:.3f} ms", flush=True)
        oA, tA = ref_cache[(rows, n)]
        f = jax.jit(functools.partial(rows_w2, n1=n1, n2=n2, factors=factors))
        try:
            t0 = time.time()
            o = f(re, im)
            _ = float(jnp.sum(o[0][:2, :2]))
            comp = time.time() - t0
            t = _device_time(f, (re, im))
            rel = float(jax.jit(
                lambda orr, oi, rr, ri: jnp.sqrt(
                    (jnp.sum((orr - rr) ** 2) + jnp.sum((oi - ri) ** 2))
                    / (jnp.sum(rr ** 2) + jnp.sum(ri ** 2)))
            )(o[0], o[1], oA[0], oA[1]))
            print(f"  ({n1},{n2}) {factors}: {t*1e3:.3f} ms "
                  f"(compile {comp:.0f}s)  relL2={rel:.2e}", flush=True)
        except Exception as e:
            print(f"  ({n1},{n2}) {factors}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
