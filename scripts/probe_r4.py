#!/usr/bin/env python
"""Round-2 probes, part 3 (HISTORICAL, no longer importable: bigfft._vpu_dft_lead was superseded by pallas_fft._stage_dft).

HISTORICAL — every variant here crashed the remote Mosaic compiler
(HTTP 500).  Root cause isolated later (/tmp/bisect.py -> PERFORMANCE.md):
rank-3 `broadcasted_iota` in `_stage_twiddle` is rejected by this Mosaic;
tables must be generated in 2-D and reshaped.  The corrected machinery
lives in pallas_fft._dft_sublane_chain (probe_r5 measures it).

The measured MXU truth (probe_r2/r3): [64,64]-shaped realcat dots run at the
full f32 MAC rate; [64,64] Gauss triples and smaller dots do not; in-kernel
transposes are ~free; dot algorithm presets and HIGH are unsupported.

So the minimum-MAC schedule uses realcat32 atoms ([64,64] dots) plus
pure-VPU butterflies for 2/4/8 factors:
    n=4096:  (4,32,32)   -> 256 f32 MACs/pt  (current kernel: 512)
    n=8192:  (8,32,32)   -> 256 + VPU8
    n=8192b: (2,4,32,32) -> 256 + 2 trivial VPU stages
    n=16384: (4,4,32,32) -> 256 + 2 VPU4
Compare against the current row kernel at each n.

Run: nohup setsid python scripts/probe_r4.py > /tmp/probe_r4.out 2>&1 &
"""
from __future__ import annotations

import functools
import math
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
from fft_wgpu_tpu.ops.bigfft import _vpu_dft_lead

_PREC = jax.lax.Precision.HIGHEST


def _stage_twiddle(k_f, rest_shape, n_block, sign):
    """tw[k, m_rest] = exp(sign*2pi*i*k*m_rest/n_block) where m_rest is the
    flattened remaining factor index (product of rest_shape).  Index
    products < n_block <= 2^22 are f32-exact up to 2^24."""
    m_rest = 1
    for d in rest_shape:
        m_rest *= d
    k = jax.lax.broadcasted_iota(jnp.int32, (k_f, m_rest), 0).astype(jnp.float32)
    m = jax.lax.broadcasted_iota(jnp.int32, (k_f, m_rest), 1).astype(jnp.float32)
    t = k * m
    r = t - n_block * jnp.floor(t / n_block)
    th = (sign * 2.0 * math.pi / n_block) * r
    return (jnp.cos(th).reshape(k_f, *rest_shape),
            jnp.sin(th).reshape(k_f, *rest_shape))


def sublane_dft_sched(xr, xi, factors, sign, scale=1.0):
    """DFT over the leading axis (size prod(factors)) of [S, ...], factored
    per `factors` (major factor first).  Returns natural leading order.

    After stage j the array is [k_j, .., k_1, remaining_factors.., lanes...];
    each stage contracts the first remaining factor dim (position j) and the
    dot moves its k to the front.
    """
    S = 1
    for f in factors:
        S *= f
    rest = xr.shape[1:]
    L = len(factors)
    xr = xr.reshape(*factors, *rest)
    xi = xi.reshape(*factors, *rest)

    block = S  # transform size of the remaining (un-contracted) block
    for j, f in enumerate(factors):
        dim = j            # position of this factor's m-dim
        kdims = j          # number of k dims already in front
        last = j == L - 1
        st_scale = scale if last else 1.0
        if f <= 8 and dim == 0 and st_scale == 1.0:
            br, bi = _vpu_dft_lead(xr, xi, f, sign)
            # result [k, rest...] with k in front — same as dot path below
            # but _vpu_dft_lead only handles the leading dim; factors with
            # dim>0 fall through to the dot path.
        elif 2 * f <= 128 and st_scale == 1.0:
            br, bi = pf._cdot_realcat(f, sign, xr, xi, dim, ((1,), (dim,)))
        else:
            wr, wi = pf._gen_dft(f, f, f, sign, st_scale)
            if 2 * f <= 128:
                wbig = jnp.concatenate(
                    [jnp.concatenate([wr, -wi], axis=1),
                     jnp.concatenate([wi, wr], axis=1)], axis=0)
                xcat = jnp.concatenate([xr, xi], axis=dim)
                res = jax.lax.dot_general(
                    wbig, xcat, ((((1,), (dim,))), ((), ())), precision=_PREC,
                    preferred_element_type=jnp.float32)
                br = res[:f]
                bi = res[f:]
            else:
                br, bi = pf._cdot(wr, wr + wi, wi - wr, xr, xi,
                                  ((1,), (dim,)))
        # new k is at front; the old leading k dims shifted right by one
        if not last:
            rem = factors[j + 1:]
            twr, twi = _stage_twiddle(f, rem, block, sign)
            bshape = (f,) + (1,) * kdims + tuple(rem) + (1,) * len(rest)
            twr = twr.reshape(bshape)
            twi = twi.reshape(bshape)
            xr = br * twr - bi * twi
            xi = br * twi + bi * twr
            block //= f
        else:
            xr, xi = br, bi
    # dims are [k_L, .., k_1, rest]: flatten is the natural order
    return xr.reshape(S, *rest), xi.reshape(S, *rest)


def _kernel_v3(xr_ref, xi_ref, or_ref, oi_ref, *, n, factors, sign, scale):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T
    ai = xi_ref[:].T
    dr, di = sublane_dft_sched(ar, ai, factors, sign, scale)
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_v3(re, im, factors, sign=-1):
    rows, n = re.shape
    bt = 128
    kern = functools.partial(_kernel_v3, n=n, factors=tuple(factors),
                             sign=sign, scale=1.0)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re, im)


def main():
    for n, rows, factors in [
        (4096, 4096, (4, 32, 32)),
        (4096, 4096, (32, 32, 4)),   # VPU factor last (dot-path ordering)
        (8192, 2048, (8, 32, 32)),
        (8192, 2048, (2, 4, 32, 32)),
        (16384, 1024, (4, 4, 32, 32)),
    ]:
        re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
        base = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        cand = jax.jit(functools.partial(rows_v3, factors=factors))
        try:
            t0 = time.time()
            cr, ci = cand(re, im)
            _ = float(jnp.sum(cr[:2, :2]))
            comp = time.time() - t0
        except Exception as e:
            print(f"n={n} {factors}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
            continue
        br_, bi_ = base(re, im)
        rel = float(jax.jit(lambda a, b, c, d: jnp.sqrt(
            (jnp.sum((a - c) ** 2) + jnp.sum((b - d) ** 2))
            / (jnp.sum(c ** 2) + jnp.sum(d ** 2))))(cr, ci, br_, bi_))
        dt_c = _device_time(cand, (re, im))
        dt_b = _device_time(base, (re, im))
        bw = 819e9
        frac = (2 * rows * n * 8 / bw) / dt_c
        print(f"n={n} {factors}: v3={dt_c*1e3:.3f} ms ({frac:.1%} roofline) "
              f"base={dt_b*1e3:.3f} ms speedup={dt_b/dt_c:.2f}x rel={rel:.2e} "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
