#!/usr/bin/env python
"""Round-3 probe M (VERDICT item 3): four-step pass decomposition.

BENCH accounting says 2^22 x4 = 1.959 ms against a 2-pass 0.656 ms floor
(33.5%).  probe_r44 closed the relayout question (0.41 ms, at the copy
floor), so the passes themselves total ~1.55 ms where the tuned row pass
alone (rows_t 4096 over 16.8M pts) costs ~0.59.  This probe times each
piece in isolation to find where the other ~0.9 ms lives, then sweeps
the obvious pass-1 levers (lane tile, sublane split, chain factors).

Run: nohup setsid python scripts/probe_r52.py > /tmp/probe_r52.out 2>&1 &
"""
import signal
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.ops import fourstep
from fft_wgpu_tpu.ops import pallas_fft as pf


def main():
    from bench import _device_time
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()
    signal.signal(signal.SIGALRM,
                  lambda s, f: (_ for _ in ()).throw(TimeoutError()))

    def run(tag, fn, args, budget=600):
        try:
            signal.alarm(budget)
            f = jax.jit(fn)
            o = f(*args)
            _ = float(jnp.sum(o[0].ravel()[:4]))
            t = _device_time(f, args)
            signal.alarm(0)
            print(f"{tag}: {t*1e3:.3f} ms", flush=True)
            return t
        except Exception as e:
            signal.alarm(0)
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None

    # ---- M1. full four-step baselines ----
    for e, b in [(22, 4), (21, 8)]:
        n = 1 << e
        re = jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(1), (b, n), jnp.float32)
        run(f"M1 2^{e} x{b} four-step full",
            lambda a, c: fourstep.fft_last_axis(a, c, -1), (re, im))

    # ---- M2. piece decomposition at 2^22 x4 (n1=1024, n2=4096) ----
    n, b = 1 << 22, 4
    n1, n2 = 1024, 4096
    r3 = jax.random.normal(jax.random.PRNGKey(2), (b, n1, n2), jnp.float32)
    i3 = jax.random.normal(jax.random.PRNGKey(3), (b, n1, n2), jnp.float32)
    rf = jax.random.normal(jax.random.PRNGKey(4), (b, n), jnp.float32)

    # relayouts (probe_r44 re-check): flat -> rank3 and rank3 -> flat
    run("M2 relayout flat->[b,n1,n2] (+1.0 consumer)",
        lambda a: ((a.reshape(b, n1, n2) + 1.0),), (rf,))
    run("M2 relayout [b,n2,n1]->flat (+1.0 consumer)",
        lambda a: ((a.reshape(b, n) + 1.0),),
        (jax.random.normal(jax.random.PRNGKey(5), (b, n2, n1),
                           jnp.float32),))

    # pass 1: ax0 over n1=1024 (both planes)
    run("M2 pass1 ax0 n=1024 [4,1024,4096]",
        lambda a, c: pf.fft_axis0_split(a, c, -1), (r3, i3))

    # pass 2: rows_t over n2=4096 with the outer twiddle
    run("M2 pass2 rows_t n=4096 outer=(1024, 2^22)",
        lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None,
                                                  outer=(n1, n)),
        (r3, i3))
    run("M2 pass2 rows_t n=4096 NO outer",
        lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None),
        (r3, i3))

    # ---- M3. pass-1 levers: lane tile / split / chain ----
    import functools
    orig_tiles = dict(pf._AX0_LANE_TILES)
    for lt in (256, 512):
        pf._AX0_LANE_TILES[1024] = lt
        run(f"M3 ax0 1024 lane tile {lt}",
            lambda a, c: pf.fft_axis0_split(a, c, -1), (r3, i3))
    pf._AX0_LANE_TILES.clear()
    pf._AX0_LANE_TILES.update(orig_tiles)

    orig_split = pf._choose_split_sublane

    def with_split(n1s, n2s, tag):
        def split(nn):
            if nn == 1024:
                return (n1s, n2s)
            return orig_split(nn)
        pf._choose_split_sublane = split
        try:
            run(tag, lambda a, c: pf.fft_axis0_split(a, c, -1), (r3, i3))
        finally:
            pf._choose_split_sublane = orig_split

    with_split(64, 16, "M3 ax0 1024 split (64,16)")
    with_split(16, 64, "M3 ax0 1024 split (16,64)")
    with_split(8, 128, "M3 ax0 1024 split (8,128)")

    # bigger chains via _S1_CHAINS: (128, 8)? 128 not in chains; add one
    orig_chains = dict(pf._S1_CHAINS)
    try:
        pf._S1_CHAINS[128] = (4, 4, 8)
        with_split(128, 8, "M3 ax0 1024 split (128,8) chain (4,4,8)")
        pf._S1_CHAINS[256] = (4, 8, 8)
        with_split(256, 4, "M3 ax0 1024 split (256,4) chain (4,8,8)")
    finally:
        pf._S1_CHAINS.clear()
        pf._S1_CHAINS.update(orig_chains)

    # ---- M4. 2^21 pieces (n1=512, n2=4096) ----
    n, b = 1 << 21, 8
    n1 = 512
    r3b = jax.random.normal(jax.random.PRNGKey(6), (b, n1, n2), jnp.float32)
    i3b = jax.random.normal(jax.random.PRNGKey(7), (b, n1, n2), jnp.float32)
    run("M4 pass1 ax0 n=512 [8,512,4096]",
        lambda a, c: pf.fft_axis0_split(a, c, -1), (r3b, i3b))
    run("M4 pass2 rows_t n=4096 outer=(512, 2^21)",
        lambda a, c: pf.fft_rows_transposed_split(a, c, -1, None,
                                                  outer=(n1, n)),
        (r3b, i3b))


if __name__ == "__main__":
    main()
