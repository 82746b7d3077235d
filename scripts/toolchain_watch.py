#!/usr/bin/env python
"""Executable toolchain watch-list (VERDICT r4 item 9).

The performance ceiling of the fused kernels is pinned by a set of
MEASURED Mosaic/compile-service dead ends (PERFORMANCE.md).  Any
jax/Mosaic/libtpu update could unpin one of them — this script turns the
re-check from archaeology into one command: each item re-probes in a
hard-killed subprocess (the hang class blocks inside a C call where
SIGALRM never fires — probe_r63) and prints a one-line verdict:

    <name>: STILL DEAD (<reason>)        — toolchain unchanged
    <name>: CHANGED — <action to take>   — re-evaluate that design door

Run ON THE TPU HOST, solo (one TPU process at a time — CLAUDE.md):

    python scripts/toolchain_watch.py

The known-HANG probe runs LAST and is followed by a tunnel recovery
check, so a wedged compile service cannot poison the earlier verdicts.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

# (name, expected_failure, action-if-changed)
WATCHLIST = [
    ("precision_high",
     "NotImplementedError in the Pallas dot lowering",
     "a 3-pass f32 dot mode may exist now: re-run the round-2b pass-count "
     "ladder (PERFORMANCE.md) — a x3 mode puts the headline at ~0.66 ms"),
    ("dot_algorithm_x3",
     "DotAlgorithmPreset crashes the Pallas lowering (precision[0])",
     "try BF16_BF16_F32_X3 on the production kernels' dots for a "
     "HIGHEST->x3 swap (~2x dot-pass savings at ~1e-6 accuracy)"),
    ("split_128_128",
     "(128,128) balanced chains crash/hang the compile service",
     "re-measure (128,128)+(4,8,4) at n=16384 vs the DIT chain "
     "(probe_r18/round-4c: chain is 84% of bound, a full-rate 2-level "
     "schedule could close the rest)"),
    ("lane64_split",
     "Mosaic rejects vector casts splitting a 64-lane minor dim",
     "revisit the batched tall big kernel (PERFORMANCE.md dead end #1: "
     "minor-8 lane split was the blocker)"),
    ("prime257_hang",
     "factor dims with a prime > 128 hang the compile service in a C "
     "call (probe_r63)",
     "lift the factors<=128 guard in _choose_general_split and re-probe "
     "the (3,257)/(17,241) ladder"),
]


# ------------------------------------------------------------------ #
# children: each runs ONE probe and prints PROBE_OK only on success
# (success == the historically-dead operation now works)
# ------------------------------------------------------------------ #
def _pallas_dot(precision):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        w = jnp.full((128, 128), 0.01, jnp.float32)
        o_ref[:] = jax.lax.dot_general(
            w, x_ref[:], ((((1,), (0,))), ((), ())),
            precision=precision, preferred_element_type=jnp.float32)

    x = jnp.ones((128, 128), jnp.float32)
    r = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(x)
    print("PROBE_OK", float(r.sum()), flush=True)


def child_precision_high():
    import jax

    _pallas_dot(jax.lax.Precision.HIGH)


def child_dot_algorithm_x3():
    import jax

    _pallas_dot(jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3)


def child_split_128_128():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fft_wgpu_tpu.ops import pallas_fft as pf

    # force the two-level (128,128) schedule for n=16384 (production
    # routes it to the DIT chain because this crashes)
    pf._BALANCED.pop(16384, None)
    pf._choose_split = lambda n: (128, 128)
    x = np.random.default_rng(0).standard_normal((128, 16384)).astype(
        np.float32)
    r = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))(
        jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    got = np.asarray(r[0]) + 1j * np.asarray(r[1])
    rel = float(np.linalg.norm(got - np.fft.fft(x, axis=-1))
                / np.linalg.norm(np.fft.fft(x, axis=-1)))
    print("PROBE_OK rel", rel, flush=True)


def child_lane64_split():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        # split a 64-lane minor dim (not a 128 multiple): historically
        # "unsupported shape cast" in Mosaic
        o_ref[:] = x_ref[:].reshape(128, 2, 32).sum(axis=1)

    x = jnp.ones((128, 64), jnp.float32)
    r = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((128, 32), jnp.float32))(x)
    print("PROBE_OK", float(r.sum()), flush=True)


def child_prime257_hang():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fft_wgpu_tpu.ops import pallas_fft as pf

    pf._choose_general_split = lambda n: (3, 257)  # bypass the guard
    x = np.random.default_rng(0).standard_normal((8, 771)).astype(
        np.float32)
    r = jax.jit(lambda a, b: pf.fft_rows_general_split(a, b, -1))(
        jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    got = np.asarray(r[0]) + 1j * np.asarray(r[1])
    want = np.fft.fft(x, axis=-1)
    print("PROBE_OK rel",
          float(np.linalg.norm(got - want) / np.linalg.norm(want)),
          flush=True)


# ------------------------------------------------------------------ #
# parent
# ------------------------------------------------------------------ #
def _recovery_check(env):
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp;"
             "print('rec', float(jax.jit(jnp.sum)(jnp.ones((4,4)))))"],
            timeout=600, capture_output=True, text=True, env=env,
            start_new_session=True)
        return "rec" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def parent(timeout=300):
    env = dict(os.environ)
    print(f"toolchain_watch: {len(WATCHLIST)} probes, "
          f"{timeout}s hard-kill each", flush=True)
    hung = False
    for name, expected, action in WATCHLIST:
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--child", name],
                timeout=timeout, capture_output=True, text=True, env=env,
                start_new_session=True)
            el = time.time() - t0
            if "PROBE_OK" in p.stdout:
                print(f"{name}: CHANGED [{el:.0f}s] — {action}",
                      flush=True)
            else:
                tail = [ln for ln in (p.stdout + p.stderr).splitlines()
                        if ln.strip()][-1:] or ["(no output)"]
                print(f"{name}: STILL DEAD ({expected}) "
                      f"[{el:.0f}s rc={p.returncode}: {tail[0][:120]}]",
                      flush=True)
        except subprocess.TimeoutExpired:
            hung = True
            print(f"{name}: STILL DEAD ({expected}) "
                  f"[HUNG, killed at {timeout}s]", flush=True)
            print("cooling down 180s before recovery check...",
                  flush=True)
            time.sleep(180)
            ok = _recovery_check(env)
            msg = "ok" if ok else \
                "NOT RECOVERED — wait 2-4 min before the next TPU job"
            print(f"tunnel recovery: {msg}", flush=True)
            if not ok:
                print("aborting remaining probes", flush=True)
                return
    if not hung:
        print("toolchain_watch done (no hangs)", flush=True)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--child":
        globals()[f"child_{sys.argv[2]}"]()
    else:
        parent()
