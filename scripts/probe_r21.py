#!/usr/bin/env python
"""Probe: (a) headline balanced kernel with the m2 axis split in halves so
each half's stage-2 partial dot can overlap the other half's VPU chain
(MXU total unchanged: two half-K dots at half rate); (b) bigfft 2^20
sublane-chain schedule candidates (current: (8,32,32), 0.157 ms).

Run: nohup setsid python scripts/probe_r21.py > /tmp/probe_r21.out 2>&1 &
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


def _kernel_rows_bal2(xr_ref, xi_ref, or_ref, oi_ref, *, n, n1, n2, sign,
                      scale, factors, nsplit):
    bt = xr_ref.shape[0]
    ar = xr_ref[:].T.reshape(n1, n2, bt)
    ai = xi_ref[:].T.reshape(n1, n2, bt)
    h = n2 // nsplit
    w2r, w2i = pf._gen_dft(n2, n2, n2, sign, scale)
    twr, twi = pf._gen_twiddle(n1, n2, n, sign)
    acc = None
    for p in range(nsplit):
        sl = slice(p * h, (p + 1) * h)
        br, bi = pf._vpu_dft_leading(ar[:, sl], ai[:, sl], n1, sign, factors)
        cr = br * twr[:, sl][:, :, None] - bi * twi[:, sl][:, :, None]
        ci = br * twi[:, sl][:, :, None] + bi * twr[:, sl][:, :, None]
        wr_p, wi_p = w2r[:, sl], w2i[:, sl]
        wbig = jnp.concatenate(
            [jnp.concatenate([wr_p, -wi_p], 1),
             jnp.concatenate([wi_p, wr_p], 1)], 0)
        xcat = jnp.concatenate([cr, ci], axis=1)
        res = jax.lax.dot_general(
            wbig, xcat, ((((1,), (1,))), ((), ())), precision=pf._MM_PREC,
            preferred_element_type=jnp.float32)
        acc = res if acc is None else acc + res
    dr, di = acc[:n2], acc[n2:]
    or_ref[:] = dr.reshape(n, bt).T
    oi_ref[:] = di.reshape(n, bt).T


def rows_bal2(re, im, sign, nsplit):
    n = re.shape[-1]
    rows = re.shape[0]
    n1, n2, factors = pf._BALANCED[n]
    bt = 128
    kern = functools.partial(
        _kernel_rows_bal2, n=n, n1=n1, n2=n2, sign=sign, scale=1.0,
        factors=factors, nsplit=nsplit)
    spec = pl.BlockSpec((bt, n), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=(pl.cdiv(rows, bt),),
        in_specs=[spec, spec], out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((rows, n), jnp.float32)] * 2,
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
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # (a) headline 4096x4096 split-overlap variants
    rows, n = 4096, 4096
    re = jax.random.normal(jax.random.PRNGKey(0), (rows, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (rows, n), jnp.float32)
    f0 = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1,
                                                   schedule="balanced"))
    o0 = f0(re, im)
    _ = float(jnp.sum(o0[0][:2, :2]))
    t0 = _device_time(f0, (re, im))
    print(f"4096 balanced prod: {t0*1e3:.3f} ms", flush=True)
    for nsplit in (2, 4):
        try:
            fb = jax.jit(lambda a, b, s=nsplit: rows_bal2(a, b, -1, s))
            tc = time.time()
            ob = fb(re, im)
            _ = float(jnp.sum(ob[0][:2, :2]))
            comp = time.time() - tc
            rel = rel_split(ob[0], ob[1], o0[0], o0[1])
            tb = _device_time(fb, (re, im))
            print(f"4096 bal2 nsplit={nsplit}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"4096 bal2 nsplit={nsplit}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # (b) bigfft 2^20 schedule candidates
    from fft_wgpu_tpu.ops import bigfft
    n = 1 << 20
    S = n // 128
    reb = jax.random.normal(jax.random.PRNGKey(2), (1, n), jnp.float32)
    imb = jax.random.normal(jax.random.PRNGKey(3), (1, n), jnp.float32)
    orig = pf._dit_schedule
    ref_o = None
    for factors in [(8, 32, 32), (4, 4, 64), (2, 64, 64), (4, 4, 4, 4, 32),
                    (8, 8, 8, 4, 4)]:
        pf._dit_schedule = (lambda s, _f=factors, _o=orig:
                            _f if s == S else _o(s))
        try:
            fb = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
            tc = time.time()
            ob = fb(reb, imb)
            _ = float(jnp.sum(ob[0][:1, :2]))
            comp = time.time() - tc
            if ref_o is None:
                ref_o, rel = ob, 0.0
            else:
                rel = rel_split(ob[0], ob[1], ref_o[0], ref_o[1])
            tb = _device_time(fb, (reb, imb))
            print(f"2^20 chain {factors}: {tb*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            print(f"2^20 chain {factors}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
        finally:
            pf._dit_schedule = orig


if __name__ == "__main__":
    main()
