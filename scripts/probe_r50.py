#!/usr/bin/env python
"""Round-3 probe J (VERDICT item 3, second attempt): GRID-chunked big kernel.

probe_r49's manual async-copy output streaming crashed the Mosaic compile
service (HTTP 500) for every chunk count.  This variant gets the same
output/compute overlap from Pallas's OWN pipeline machinery instead:

  - grid = (rows, chunks); VMEM scratch [S, 128] persists across steps;
  - input block (1, n) with index_map (r, c) -> (r, 0): fetched once per
    row (constant revisit), prefetched across rows;
  - @pl.when(c == 0): stage-1 sublane chain + outer twiddle into scratch;
  - every step: an R = 128/chunks row-slice of the lane-DFT (rows
    generated in-register at traced offset c*R) -> out block (1, R*S).
    D[k_l, :] rows are contiguous spans of the flat output, so the block
    is a plain lane range and Pallas double-buffers the copies out.

Also probes the batched form: [rows, n] -> [rows, 1, n] (free leading
split) makes the block shape (1, 1, n) EQUAL to the array's trailing dims,
sidestepping the "block sublane dim must divide 8 or equal the array dim"
rule that forced batched large-N onto the four-step.

Run: nohup setsid python scripts/probe_r50.py > /tmp/probe_r50.out 2>&1 &
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

from fft_wgpu_tpu.ops import bigfft
from fft_wgpu_tpu.ops import pallas_fft as pf


def _kernel_chunked(xr_ref, xi_ref, or_ref, oi_ref, sr, si, *, n, sign,
                    scale, chunks):
    S = n // 128
    R = 128 // chunks
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _stage1():
        ar = xr_ref[0, 0].reshape(S, 128)
        ai = xi_ref[0, 0].reshape(S, 128)
        br, bi = pf._dft_sublane_chain(ar, ai, S, sign,
                                       factors=bigfft._CHAIN_SCHEDULE.get(S))
        cr, ci = bigfft._outer_twiddle_mul(br, bi, S, n, sign)
        sr[...] = cr
        si[...] = ci

    # stage-2 chunk: rows [c*R, (c+1)*R) of the lane-DFT matrix, generated
    # in-register at the traced offset (scale folded)
    kr, ki = pf._iota_tw((R, 128), c * R, 128, sign)
    wr = kr * scale
    wi = ki * scale
    dr, di = pf._cdot(wr, wr + wi, wi - wr, sr[...], si[...], ((1,), (1,)))
    or_ref[0] = dr.reshape(1, R * S)
    oi_ref[0] = di.reshape(1, R * S)


def fft_big_chunked(re, im, sign, scale=None, *, chunks=4):
    rows, n = re.shape
    S = n // 128
    R = 128 // chunks
    kern = functools.partial(
        _kernel_chunked, n=n, sign=sign,
        scale=float(scale) if scale else 1.0, chunks=chunks)
    in_spec = pl.BlockSpec((1, 1, n), lambda r, c: (r, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, R * S), lambda r, c: (r, 0, c),
                            memory_space=pltpu.VMEM)
    out_r, out_i = pl.pallas_call(
        kern,
        grid=(rows, chunks),
        in_specs=[in_spec, in_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, 1, n), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((S, 128), jnp.float32),
            pltpu.VMEM((S, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(re.reshape(rows, 1, n), im.reshape(rows, 1, n))
    return out_r.reshape(rows, n), out_i.reshape(rows, n)


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

    # A: single-row 2^20 / 2^21, chunk sweep
    for n in (1 << 20, 1 << 21):
        re = jax.random.normal(jax.random.PRNGKey(0), (1, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (1, n), jnp.float32)
        f0 = jax.jit(lambda a, b: bigfft.fft_big_split(a, b, -1))
        o0 = f0(re, im)
        _ = float(jnp.sum(o0[0][:1, :2]))
        t0 = _device_time(f0, (re, im))
        print(f"J 2^{n.bit_length()-1} prod: {t0*1e3:.3f} ms", flush=True)
        for chunks in (2, 4, 8):
            try:
                fs = jax.jit(lambda a, b, _c=chunks: fft_big_chunked(
                    a, b, -1, chunks=_c))
                tc = time.time()
                os_ = fs(re, im)
                _ = float(jnp.sum(os_[0][:1, :2]))
                comp = time.time() - tc
                rel = rel_split(os_[0], os_[1], o0[0], o0[1])
                ts = _device_time(fs, (re, im))
                print(f"J 2^{n.bit_length()-1} chunked c={chunks}: "
                      f"{ts*1e3:.3f} ms (compile {comp:.0f}s, rel {rel:.2e})",
                      flush=True)
            except Exception as e:
                print(f"J 2^{n.bit_length()-1} chunked c={chunks}: FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)

    # B: batched rows (the four-step's territory): 2^20 x 8, 2^21 x 8
    for n, rows in ((1 << 20, 8), (1 << 21, 8)):
        re = jax.random.normal(jax.random.PRNGKey(2), (rows, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(3), (rows, n), jnp.float32)
        # oracle: production single-row big kernel, vmapped via python loop
        f0 = jax.jit(lambda a, b: bigfft.fft_big_split(a[:1], b[:1], -1))
        o0 = f0(re, im)
        _ = float(jnp.sum(o0[0][:1, :2]))
        for chunks in (4, 8):
            try:
                fs = jax.jit(lambda a, b, _c=chunks: fft_big_chunked(
                    a, b, -1, chunks=_c))
                tc = time.time()
                os_ = fs(re, im)
                _ = float(jnp.sum(os_[0][:1, :2]))
                comp = time.time() - tc
                rel = rel_split(os_[0][:1], os_[1][:1], o0[0], o0[1])
                ts = _device_time(fs, (re, im))
                print(f"J 2^{n.bit_length()-1} x{rows} chunked c={chunks}: "
                      f"{ts*1e3:.3f} ms = {ts*1e3/rows:.3f}/row "
                      f"(compile {comp:.0f}s, rel row0 {rel:.2e})",
                      flush=True)
            except Exception as e:
                print(f"J 2^{n.bit_length()-1} x{rows} chunked c={chunks}: "
                      f"FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)

    # C: 2^22 — the old single-pass dead end (VMEM).  Chunked output frees
    # the output residency; chain liveness is the open question.  The
    # compile service HANGS on over-VMEM at this size (probe_r41), so this
    # runs LAST under an alarm.
    import signal

    def _alarm(sig, frm):
        raise TimeoutError("compile alarm")

    signal.signal(signal.SIGALRM, _alarm)
    n = 1 << 22
    re = jax.random.normal(jax.random.PRNGKey(4), (1, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(5), (1, n), jnp.float32)
    for chunks in (8,):
        try:
            signal.alarm(900)
            fs = jax.jit(lambda a, b, _c=chunks: fft_big_chunked(
                a, b, -1, chunks=_c))
            tc = time.time()
            os_ = fs(re, im)
            _ = float(jnp.sum(os_[0][:1, :2]))
            comp = time.time() - tc
            signal.alarm(0)
            xr = np.asarray(re[0], np.float64)
            xi = np.asarray(im[0], np.float64)
            ref = np.fft.fft(xr + 1j * xi)
            got = (np.asarray(os_[0][0], np.float64)
                   + 1j * np.asarray(os_[1][0], np.float64))
            rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
            ts = _device_time(fs, (re, im))
            print(f"J 2^22 chunked c={chunks}: {ts*1e3:.3f} ms "
                  f"(compile {comp:.0f}s, rel {rel:.2e})", flush=True)
        except Exception as e:
            signal.alarm(0)
            print(f"J 2^22 chunked c={chunks}: FAILED "
                  f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
