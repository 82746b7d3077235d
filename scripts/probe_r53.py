#!/usr/bin/env python
"""Round-3 probe N: where the composed four-step's extra 0.4 ms lives.

probe_r52: pieces sum to 1.56 ms (0.198 + 0.530 + 0.630 + 0.197) but the
composed program measures 1.960.  Dump the per-op device durations of the
composed program to find the discrepancy (extra copies? unfused
transposes? a second relayout on the pass-2 output?).

Run: nohup setsid python scripts/probe_r53.py > /tmp/probe_r53.out 2>&1 &
"""
import collections
import glob
import gzip
import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fft_wgpu_tpu.ops import fourstep


def per_op(fn, args, iters=8):
    r = fn(*args)
    _ = float(jnp.sum(r[0].ravel()[:8]))
    tmp = tempfile.mkdtemp(prefix="optrace")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                r = fn(*args)
            _ = float(jnp.sum(r[0].ravel()[:8]))
        paths = sorted(glob.glob(f"{tmp}/**/*.trace.json.gz",
                                 recursive=True))
        data = json.load(gzip.open(paths[-1]))
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        per_name = collections.defaultdict(list)
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
                if e["name"].startswith("jit"):
                    continue
                if e.get("dur", 0) > 3:
                    per_name[e["name"]].append(e["dur"])
        rows = []
        for name, durs in per_name.items():
            if len(durs) < iters // 2:
                continue
            durs.sort()
            rows.append((durs[len(durs) // 2], len(durs), name))
        rows.sort(reverse=True)
        return rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main():
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    n, b = 1 << 22, 4
    re = jax.random.normal(jax.random.PRNGKey(0), (b, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (b, n), jnp.float32)
    f = jax.jit(lambda a, c: fourstep.fft_last_axis(a, c, -1))
    rows = per_op(f, (re, im))
    tot = 0.0
    for dur, cnt, name in rows:
        tot += dur
        print(f"{dur/1e3:9.3f} ms  x{cnt:3d}  {name[:110]}", flush=True)
    print(f"TOTAL {tot/1e3:.3f} ms", flush=True)

    # also the lowered HLO op list (names only) for copy counting
    lowered = f.lower(re, im).compile()
    hlo = lowered.as_text()
    import re as _re
    for kind in ("copy", "transpose", "reshape", "bitcast", "fusion",
                 "custom-call"):
        cnt = len(_re.findall(rf"= \S+ {kind}", hlo))
        cnt2 = hlo.count(f" {kind}(")
        print(f"HLO {kind}: assign={cnt} calls~{cnt2}", flush=True)


if __name__ == "__main__":
    main()
