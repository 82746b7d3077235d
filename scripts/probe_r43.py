#!/usr/bin/env python
"""Probe r43: axis(-2) kernel lane-tile sweep.

The ax0 kernel was pinned to [1, n, 128] blocks; at small n with huge
lane extents (3-D axis-0 passes, four-step stage 1) the per-step
overheads dominate (fftn 256^3's axis-0 pass costs 1.46 ms — more than
BOTH fused trailing axes).  Sweeps _AX0_LANE_TILES on the shapes that
matter and re-measures the dependent paths.

Run: nohup setsid python scripts/probe_r43.py > /tmp/probe_r43.out 2>&1 &
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import _device_time
from fft_wgpu_tpu.ops import fourstep, nd, pallas_fft as pf


def tcase(tag, fn, args, chk=None):
    try:
        t0 = time.time()
        out = fn(*args)
        rel = chk(out) if chk else float("nan")
        if chk and rel > 5e-6:
            print(f"{tag}: WRONG rel={rel:.1e}", flush=True)
            return None
        t = _device_time(fn, args)
        print(f"{tag}: {t*1e3:.3f} ms rel={rel:.1e} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)
        return t
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    print("probe_r43 start", flush=True)
    k0, k1 = jax.random.PRNGKey(0), jax.random.PRNGKey(1)

    def ax0(n, m, lt):
        re = jax.random.normal(k0, (n, m), jnp.float32)
        im = jax.random.normal(k1, (n, m), jnp.float32)
        oracle = np.fft.fft(np.asarray(re[:, :2]) + 1j * np.asarray(im[:, :2]),
                            axis=0)

        def chk(out):
            g = np.asarray(out[0][:, :2]) + 1j * np.asarray(out[1][:, :2])
            return np.linalg.norm(g - oracle) / np.linalg.norm(oracle)

        pf._AX0_LANE_TILES[n] = lt
        fn = jax.jit(lambda a, b: pf.fft_axis0_split(a, b, -1))
        t = tcase(f"ax0 n={n} m={m} lt={lt}", fn, (re, im), chk)
        jax.clear_caches()
        return t

    best = {}
    for n, m, tiles in ((256, 65536, (128, 256, 512, 1024, 2048)),
                        (512, 262144, (128, 512, 1024, 2048, 4096)),
                        (1024, 4096, (128, 256, 512, 1024, 2048)),
                        (512, 4096, (128, 512, 1024, 2048)),
                        (4096, 4096, (128, 256, 512))):
        ts = {}
        for lt in tiles:
            t = ax0(n, m, lt)
            if t:
                ts[lt] = t
        if ts:
            w = min(ts, key=ts.get)
            best[n] = w
            print(f"  -> n={n}: best lt={w} ({ts[w]*1e3:.3f} ms; 128 was "
                  f"{ts.get(128, float('nan'))*1e3:.3f})", flush=True)
        pf._AX0_LANE_TILES.pop(n, None)

    # apply winners, re-measure the dependent paths
    pf._AX0_LANE_TILES.update(best)
    print(f"pins: {best}", flush=True)

    for n in (256, 512):
        re = jax.random.normal(k0, (n, n, n), jnp.float32)
        im = jax.random.normal(k1, (n, n, n), jnp.float32)
        fn = jax.jit(lambda a, b: nd.fftn_split(a, b, (0, 1, 2), -1,
                                                None, "auto"))
        # timing-only rows: full 3-D correctness is asserted in
        # probe_r42 / tests (a numpy oracle at 512^3 is ~2 GiB of host
        # work per iteration and was never compared here anyway)
        tcase(f"fftn {n}^3 (pinned tiles)", fn, (re, im))

    for n, rows in ((1 << 22, 4), (1 << 21, 8)):
        re = jax.random.normal(k0, (rows, n), jnp.float32)
        im = jax.random.normal(k1, (rows, n), jnp.float32)
        fn = jax.jit(lambda a, b: fourstep.fft_last_axis(a, b, -1))
        out = fn(re, im)
        g = np.asarray(out[0])[0, :4] + 1j * np.asarray(out[1])[0, :4]
        oracle = np.fft.fft(np.asarray(re[0]).astype(np.float64)
                            + 1j * np.asarray(im[0]))[:4]
        rel = np.linalg.norm(g - oracle) / np.linalg.norm(oracle)
        t = _device_time(fn, (re, im))
        print(f"fourstep 2^{n.bit_length()-1}x{rows} (pinned tiles): "
              f"{t*1e3:.3f} ms rel={rel:.1e}", flush=True)


if __name__ == "__main__":
    main()
    print("probe_r43 done", flush=True)
