#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.json): batched 1-D fp32 C2C FFT GFLOP/s
(5 N log2 N convention) vs the HBM-bandwidth roofline on the local chip,
at N=4096 x batch 4096.  vs_baseline is achieved/(0.8 * roofline): >= 1.0
means the >=80%-of-roofline target is met.

Measurement discipline (contrast with the reference's loop, which times
H2D+D2H every iteration — examples/basic.rs:70-129): inputs are generated
on device, the op is replayed under jit, and only scalar validation
metrics ever cross the device boundary (some TPU runtimes cannot transfer
complex arrays at all — see .claude/skills/verify/SKILL.md).

Extra (non-headline) rows are printed to stderr for the record.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

if __name__ == "__main__" and "--headline-child" not in sys.argv:
    # Parent mode must not import jax at all: a second process merely
    # importing jax while the child owns the TPU can wedge the remote
    # tunnel (see .claude/skills/verify/SKILL.md gotcha 6).
    jax = jnp = np = None
else:
    import jax
    import jax.numpy as jnp
    import numpy as np


def _device_time(fn, args, iters=8):
    """Median device-side duration of the op via the JAX profiler — the
    analogue of timing with nvprof: excludes host dispatch latency (tens of
    ms on remote tunnels).  Returns None if no device events are captured
    (then the caller falls back to chain timing)."""
    import collections
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    r = fn(*args)
    _ = float(jnp.sum(r[0].ravel()[:8]))
    tmp = tempfile.mkdtemp(prefix="benchtrace")
    try:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                r = fn(*args)
            _ = float(jnp.sum(r[0].ravel()[:8]))
        paths = sorted(glob.glob(f"{tmp}/**/*.trace.json.gz", recursive=True))
        if not paths:
            return None
        data = json.load(gzip.open(paths[-1]))
        pids = {
            e["pid"]: e["args"].get("name", "")
            for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        # sum per-iteration device custom-call/fusion durations, take median
        per_name = collections.defaultdict(list)
        for e in data["traceEvents"]:
            if e.get("ph") == "X" and "TPU" in pids.get(e["pid"], ""):
                # skip the enclosing jit-module event (would double-count)
                if e["name"].startswith("jit"):
                    continue
                if e.get("dur", 0) > 3:  # count everything per-iteration
                    per_name[e["name"]].append(e["dur"])
        total = 0.0
        for durs in per_name.values():
            if len(durs) < iters // 2:  # not a per-iteration op
                continue
            durs.sort()
            total += durs[len(durs) // 2]
        return total / 1e6 if total else None
    except Exception:
        return None
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _dispatch_floor():
    """Per-call dispatch+sync overhead of this runtime (remote tunnels:
    tens of ms), measured with a trivial program."""
    f = jax.jit(lambda a: jnp.sum(a))
    x = jnp.ones((8, 128))
    _ = float(f(x))
    return min(_timed(f, x) for _ in range(5))


def _time_op(fn_split, args, iters=64):
    """Device time per iteration of `fn_split((re, im)) -> (re, im)`.

    Remote-tunnel runtimes have ~30 ms per-dispatch latency and a
    `block_until_ready` that does not truly sync, so neither python-loop
    timing nor single-call timing works.  The iteration chain runs
    *device-side* inside one jitted `fori_loop` (each step consumes the
    previous output), synced by a scalar readback; the measured dispatch
    floor is subtracted.  One compile per config keeps the harness usable
    on slow remote-compile services.
    """
    re, im = args

    @jax.jit
    def run(a, b):
        def body(_, c):
            return fn_split(c)

        a, b = jax.lax.fori_loop(0, iters, body, (a, b))
        return jnp.sum(a[..., 0]) + jnp.sum(b[..., 0])

    _ = float(run(re, im))  # compile
    t = min(_timed(run, re, im) for _ in range(3))
    return max((t - _dispatch_floor()) / iters, 1e-9)


def _timed(fn, *args):
    t0 = time.perf_counter()
    _ = float(fn(*args))
    return time.perf_counter() - t0


def bench_batched_1d(n=4096, batch=4096, executor="auto", iters=30):
    """Forward batched 1-D C2C; returns (seconds, roundtrip_rel_l2)."""
    from fft_wgpu_tpu.plan.plan import get_plan

    p = get_plan(n, executor)
    re = jax.random.normal(jax.random.PRNGKey(0), (batch, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(1), (batch, n), jnp.float32)

    fwd = jax.jit(lambda a, b: p._execute_split(a, b, -1, None))
    inv = jax.jit(lambda a, b: p._execute_split(a, b, +1, 1.0 / n))

    # primary: profiler device time (dispatch-free); fallback: device-side
    # chained loop
    dt = _device_time(fwd, (re, im))
    if dt is None:
        dt = _time_op(
            lambda c: p._execute_split(c[0], c[1], -1, None), (re, im),
            iters=iters,
        )

    # correctness: on-device roundtrip + impulse, scalar transfers only
    fr, fi = fwd(re, im)
    rr, ri = inv(fr, fi)
    rt = float(
        jnp.sqrt(jnp.sum((rr - re) ** 2 + (ri - im) ** 2) / jnp.sum(re**2 + im**2))
    )
    d = jnp.zeros((8, n), jnp.float32).at[:, 0].set(1.0)
    dr, di = jax.jit(lambda a, b: p._execute_split(a, b, -1, None))(
        d, jnp.zeros_like(d)
    )
    imp = float(jnp.max(jnp.abs(dr - 1.0)) + jnp.max(jnp.abs(di)))
    return dt, rt, imp


def _ceiling_probes(n, batch, dev):
    """Measure the two perf ceilings at the headline shape (see the
    call-site comment).  Returns dict(copy_ms, copy_frac, bound_ms)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from fft_wgpu_tpu.ops import pallas_fft as pf
    from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

    re = jax.random.normal(jax.random.PRNGKey(20), (batch, n), jnp.float32)
    im = jax.random.normal(jax.random.PRNGKey(21), (batch, n), jnp.float32)

    def _copy_kernel(xr_ref, xi_ref, or_ref, oi_ref):
        or_ref[:] = xr_ref[:]
        oi_ref[:] = xi_ref[:]

    spec = pl.BlockSpec((128, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    copy_fn = jax.jit(lambda a, b: pl.pallas_call(
        _copy_kernel,
        grid=(batch // 128,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((batch, n), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
    )(a, b))
    copy_s = _device_time(copy_fn, (re, im))
    if copy_s is None:
        raise RuntimeError("profiler captured no device events (copy)")
    ideal = 4.0 * batch * n * 4 / hbm_bandwidth(dev)  # 2 arrays in+out
    copy_frac = ideal / copy_s

    # production kernel, dots dropped to 1-pass bf16 (timing-only: the
    # numerics are ~3e-3 at this precision — never returned to callers)
    saved = pf._MM_PREC
    try:
        pf._MM_PREC = jax.lax.Precision.DEFAULT
        fast = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1, None))
        bound_s = _device_time(fast, (re, im))
    finally:
        pf._MM_PREC = saved
    if bound_s is None:
        raise RuntimeError("profiler captured no device events (bound)")
    return {"copy_s": copy_s, "copy_frac": copy_frac,
            "bound_s": bound_s}


def main():
    """Parent: run the measurement in a killable child process and forward
    its output.  A hung remote tunnel blocks inside C calls where an
    in-process SIGALRM handler never runs, so the only reliable way to
    guarantee the driver its JSON line is a process boundary: the parent
    never imports jax (a concurrent jax import can wedge the tunnel), waits
    for the child's headline line with a hard deadline, and prints an
    honest failure line itself if the child hangs or dies."""
    import queue
    import signal
    import subprocess
    import threading

    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--headline-child"],
        stdout=subprocess.PIPE,
        text=True,
        start_new_session=True,  # killpg reaches any grandchildren
    )
    lines: queue.Queue = queue.Queue()

    def _pump():
        for line in proc.stdout:
            lines.put(line)
        lines.put(None)

    threading.Thread(target=_pump, daemon=True).start()

    def _kill():
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            pass

    try:
        headline = lines.get(
            timeout=float(os.environ.get("BENCH_HEADLINE_TIMEOUT", "1500")))
    except queue.Empty:
        headline = None
    if headline is None:
        _kill()
        # failure JSON is the only (and therefore final) stdout line
        print(json.dumps({
            "metric": "batched 1D C2C FFT N=4096 batch=4096 fp32 GFLOP/s"
                      " (5NlogN)",
            "value": 0.0,
            "unit": "GFLOP/s",
            "vs_baseline": 0.0,
            "error": "backend unreachable: measurement child hung or died"
                     " before producing the headline (remote tunnel down?)",
            "note": "last completed hardware numbers: BENCHMARKS.md",
            "last_measured": {  # NOT a fresh measurement — prior session
                "ms": 0.633, "gflops": 1591,
                "roofline_fraction": 0.515, "vs_baseline": 0.644,
                "source": "BENCHMARKS.md (TPU v5e, round-2 session)",
            },
        }), flush=True)
        return
    print(headline, end="", flush=True)

    # secondary rows stream on the child's stderr (inherited); bound the
    # remainder so a wedged row cannot hold the driver forever
    deadline = time.monotonic() + 2700
    while True:
        try:
            item = lines.get(timeout=max(0.1, deadline - time.monotonic()))
        except queue.Empty:
            print("# secondary rows timed out; killing child",
                  file=sys.stderr, flush=True)
            _kill()
            break
        if item is None:
            break
        print(item, end="", flush=True)
    proc.wait()

    # Re-print the headline JSON as the FINAL stdout line (VERDICT r4 item
    # 1): the driver records only a bounded TAIL of the combined output, so
    # with many secondary rows the early headline scrolls out of the capture
    # window (BENCH_r04.json parsed=null).  The first fast print keeps the
    # hang contract; this last line is the one the driver parses.
    print(headline, end="" if headline.endswith("\n") else "\n", flush=True)


def child_main():
    import signal

    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache
    from fft_wgpu_tpu.utils.roofline import roofline

    # Remote-compile services take minutes per large kernel; the on-disk
    # cache makes repeat bench runs (and the driver's) near-instant.
    try:
        enable_persistent_compilation_cache()
    except Exception:
        pass

    # hard stop for the whole headline section: slow remote-compile services
    # must not starve the driver of the JSON line (the parent process holds
    # a second, kill-based deadline for hangs this alarm cannot interrupt)
    def _alarm(sig, frame):
        raise TimeoutError("bench section timed out")

    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(1440)
    dev = jax.devices()[0]
    n, batch = 4096, 4096
    dt, rt_err, imp_err = bench_batched_1d(n, batch)
    signal.alarm(0)
    r = roofline(n, batch, dt, passes=1, device=dev)

    result = {
        "metric": f"batched 1D C2C FFT N={n} batch={batch} fp32 GFLOP/s (5NlogN) on {dev.device_kind}",
        "value": round(r["gflops"], 1),
        "unit": "GFLOP/s",
        "vs_baseline": round(r["fraction"] / 0.8, 4),
        "roofline_fraction": round(r["fraction"], 4),
        "roofline_gflops": round(r["roofline_gflops"], 1),
        "ms": round(dt * 1e3, 3),
        "roundtrip_rel_l2": f"{rt_err:.2e}",
        "impulse_max_err": f"{imp_err:.2e}",
    }

    # Measured perf ceilings (VERDICT r3 item 4): the >=80%-of-roofline
    # target was falsified by measurement in PERFORMANCE.md prose; these
    # probes make the falsification machine-recorded data in every
    # BENCH_r*.json.  Two MEASURED ceilings at the exact headline shape:
    #   * copy_ceiling_ms — a Pallas copy-only kernel moving the same
    #     bytes (the pure-IO floor; measures ~80% of theoretical HBM BW,
    #     so even an infinitely fast kernel cannot reach vs_baseline 1.0);
    #   * compute_bound_ms — the SAME production kernel with its dots at
    #     DEFAULT (1-pass bf16) precision instead of HIGHEST (6 bf16
    #     passes).  f32 accuracy needs HIGHEST (Mosaic has no 3-pass
    #     mode), so this is a hard scheduling-free lower bound for any
    #     f32-accurate schedule of this algorithm.
    try:
        signal.alarm(420)
        ceil = _ceiling_probes(n, batch, dev)
        signal.alarm(0)
        result.update(
            copy_ceiling_ms=round(ceil["copy_s"] * 1e3, 3),
            copy_ceiling_fraction_of_hbm=round(ceil["copy_frac"], 4),
            compute_bound_ms=round(ceil["bound_s"] * 1e3, 3),
            pct_of_compute_bound=round(ceil["bound_s"] / dt, 4),
        )
    except Exception as e:  # ceilings must never cost the headline line
        result["ceiling_probe_error"] = str(e)[:200]

    # the driver's JSON line goes out BEFORE the secondary rows: with a
    # cold cache the rows below can spend many minutes compiling, and the
    # CLAUDE.md contract is that the headline line always prints quickly
    print(json.dumps(result), flush=True)

    # secondary configs (stderr, not the headline line) — every BASELINE.md
    # row is reported; each row is individually alarm-bounded so one slow
    # compile cannot starve the rest.  Per VERDICT r4 items 3/4, every row
    # carries its own MEASURED floors and a stock-XLA timing:
    #   floor=<copy>/<bound>ms — copy: a Pallas kernel with the row's
    #     exact IO pattern and zero math (the pure-DMA floor, including
    #     any ragged-minor penalty); bound: the row's own computation
    #     re-traced with all dots at DEFAULT (1-pass bf16) precision —
    #     the scheduling-free compute bound for any f32-accurate schedule
    #     (f32 needs HIGHEST = 6 bf16 passes; Mosaic has no 3-pass mode).
    #   pct_of_bound = bound/achieved (1.0 = at the measured bound).
    #   vs_stock=<x>x — stock jnp.fft (no jnp_backend patch) at the same
    #     shape, same measurement method: the "matching-or-beating" bar
    #     as per-row data instead of one anecdote.
    def _row(tag, thunk, budget=600):
        try:
            signal.alarm(budget)
            print(f"# {tag}: {thunk()}", file=sys.stderr, flush=True)
            signal.alarm(0)
        except Exception as e:
            print(f"# {tag}: failed: {e}", file=sys.stderr, flush=True)

    _copy_cache: dict = {}

    def _shapecopy_ms(in_shapes, out_shapes):
        """Device ms of a Pallas kernel reading f32 arrays of
        `in_shapes` and writing `out_shapes` (each output = sum of the
        inputs sliced/zero-padded on the minor dim): the row's exact HBM
        IO pattern with zero math.  All shapes are [rows, minor] with a
        common rows; rows is cut to a whole-block multiple and the time
        rescaled (copy time is linear in rows)."""
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        key = (tuple(in_shapes), tuple(out_shapes))
        if key in _copy_cache:
            return _copy_cache[key]
        rows = in_shapes[0][0]
        rows_r = max(128, (rows // 128) * 128)

        def kern(*refs):
            ins = refs[:len(in_shapes)]
            outs = refs[len(in_shapes):]
            for o_ref, (_, m) in zip(outs, out_shapes):
                acc = None
                for i_ref in ins:
                    src = i_ref[:]
                    sm = src.shape[1]
                    if m <= sm:
                        t = src[:, :m]
                    else:
                        t = jnp.concatenate(
                            [src, jnp.zeros((src.shape[0], m - sm),
                                            jnp.float32)], axis=1)
                    acc = t if acc is None else acc + t
                o_ref[:] = acc

        def spec(m):
            return pl.BlockSpec((128, m), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)

        args = [jax.random.normal(jax.random.PRNGKey(40 + i), (rows_r, m),
                                  jnp.float32)
                for i, (_, m) in enumerate(in_shapes)]
        fn = jax.jit(lambda *a: pl.pallas_call(
            kern,
            grid=(rows_r // 128,),
            in_specs=[spec(m) for _, m in in_shapes],
            out_specs=[spec(m) for _, m in out_shapes],
            out_shape=[jax.ShapeDtypeStruct((rows_r, m), jnp.float32)
                       for _, m in out_shapes],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=127 * 1024 * 1024),
        )(*a))
        t = _device_time(fn, tuple(args))
        if t is None:
            raise RuntimeError("no device events (shape-copy floor)")
        t *= rows / rows_r
        _copy_cache[key] = t
        return t

    def _bound_ms(raw_fn, args):
        """Re-trace `raw_fn` with every kernel dot at DEFAULT (1-pass
        bf16) and time it: the row's measured compute bound (numerics
        are ~3e-3 at that precision — timing only, never returned)."""
        from fft_wgpu_tpu.ops import pallas_fft as pf
        from fft_wgpu_tpu.ops import stockham as st

        saved = pf._MM_PREC, st._DOT_PREC
        try:
            pf._MM_PREC = jax.lax.Precision.DEFAULT
            st._DOT_PREC = jax.lax.Precision.DEFAULT
            # fresh wrapper: jax.jit caches on the FUNCTION OBJECT, so
            # jitting a raw_fn the row already jitted would return the
            # HIGHEST-precision executable (bound == achieved, bogus)
            t = _device_time(jax.jit(lambda *a: raw_fn(*a)), args)
        finally:
            pf._MM_PREC, st._DOT_PREC = saved
        if t is None:
            raise RuntimeError("no device events (bound probe)")
        return t

    def _floors_txt(dt2, copy_s=None, bound_s=None):
        """floor=<copy>/<bound>ms pct_of_bound=<x> fragment (best-effort:
        a failed probe prints '?' rather than killing the row)."""
        c = f"{copy_s*1e3:.3f}" if copy_s is not None else "?"
        b = f"{bound_s*1e3:.3f}" if bound_s is not None else "?"
        p = f" pct_of_bound={bound_s/dt2:.2f}" if bound_s else ""
        return f" floor={c}/{b}ms{p}"

    def _stock_txt(stock_fn, stock_args, dt2):
        """vs_stock=<x>x fragment via the same device-time method."""
        try:
            ts = _device_time(jax.jit(stock_fn), stock_args)
            if ts is None:
                return " vs_stock=?"
            return f" vs_stock={ts/dt2:.2f}x"
        except Exception:
            return " vs_stock=?"

    def _plan2d(rows, n2):
        """[rows, n2] planar pair shapes for the shape-copy floor."""
        return [(rows, n2), (rows, n2)]

    def _1d(n2, b2, passes):
        from fft_wgpu_tpu.plan.plan import get_plan

        dt2, rt2, _ = bench_batched_1d(n2, b2, iters=8)
        r2 = roofline(n2, b2, dt2, passes=passes, device=dev)
        # floors + stock at the same shape (big 1-D rows are reshaped to
        # an aligned 2-D for the copy probe — same bytes, same alignment)
        copy_s = bound_s = None
        try:
            if b2 * n2 >= (1 << 20) and (b2 * n2) % 4096 == 0:
                minor = 4096
                rr = b2 * n2 // minor
            else:
                minor, rr = n2, b2
            copy_s = passes * _shapecopy_ms(_plan2d(rr, minor),
                                            _plan2d(rr, minor))
        except Exception:
            pass
        p = get_plan(n2, "auto")
        re2 = jax.random.normal(jax.random.PRNGKey(30), (b2, n2),
                                jnp.float32)
        im2 = jax.random.normal(jax.random.PRNGKey(31), (b2, n2),
                                jnp.float32)
        try:
            bound_s = _bound_ms(
                lambda a, b: p._execute_split(a, b, -1, None), (re2, im2))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.fft(jax.lax.complex(a, b), axis=-1)),
            (re2, im2), dt2)
        return (
            f"{dt2*1e3:.3f} ms, {r2['gflops']:.0f} GFLOP/s, "
            f"{r2['fraction']:.1%} of {passes}-pass roofline, "
            f"roundtrip={rt2:.2e}"
            + _floors_txt(dt2, copy_s, bound_s) + stock
        )

    def _2d(n2):
        from fft_wgpu_tpu.ops.nd import fftn_split

        re = jax.random.normal(jax.random.PRNGKey(2), (n2, n2), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(3), (n2, n2), jnp.float32)
        raw = lambda a, b: fftn_split(a, b, (-2, -1), -1, None)
        fn = jax.jit(raw)
        dt2 = _device_time(fn, (re, im))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        r2 = roofline(n2, n2, dt2, passes=2, device=dev)  # two row passes
        Fr, Fi = fn(re, im)
        ref = jax.jit(
            lambda a, b: jnp.fft.fft2(jax.lax.complex(a, b)))(re, im)
        err = float(
            jnp.sqrt(jnp.sum((Fr - ref.real) ** 2 + (Fi - ref.imag) ** 2)
                     / jnp.sum(ref.real ** 2 + ref.imag ** 2)))
        gf = 2 * 5.0 * n2 * n2 * math.log2(n2) / dt2 / 1e9
        copy_s = bound_s = None
        try:
            copy_s = 2 * _shapecopy_ms(_plan2d(n2, n2), _plan2d(n2, n2))
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (re, im))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.fft2(jax.lax.complex(a, b))), (re, im), dt2)
        return (f"{dt2*1e3:.3f} ms, {gf:.0f} GFLOP/s, "
                f"{r2['fraction']:.1%} of 2-pass roofline, "
                f"vs_xla_fft2={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    def _r2c(n2, b2):
        from fft_wgpu_tpu.ops.rfft import rfft_last_split
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        x = jax.random.normal(jax.random.PRNGKey(4), (b2, n2), jnp.float32)
        raw = lambda v: rfft_last_split(v, None)
        fn = jax.jit(raw)
        dt2 = _device_time(fn, (x,))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        # R2C traffic: n f32 in, 2*(n/2+1) f32 out per row
        nb = n2 // 2 + 1
        bw = 4.0 * (n2 + 2 * nb) * b2 / dt2
        frac = bw / hbm_bandwidth(dev)
        Xr, Xi = fn(x)
        ref = jnp.fft.rfft(x, axis=-1)
        err = float(
            jnp.sqrt(jnp.sum((Xr - ref.real) ** 2 + (Xi - ref.imag) ** 2)
                     / jnp.sum(ref.real ** 2 + ref.imag ** 2)))
        # exact-IO floor: aligned [b, n] read -> TWO ragged [b, n//2+1]
        # writes (the ragged-minor DMA penalty shows up in the floor
        # itself — the numpy-parity shape misaligns every HBM row)
        copy_s = bound_s = None
        try:
            copy_s = _shapecopy_ms([(b2, n2)], [(b2, nb), (b2, nb)])
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (x,))
        except Exception:
            pass
        stock = _stock_txt(
            lambda v: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.rfft(v, axis=-1)), (x,), dt2)
        return (f"{dt2*1e3:.3f} ms, {frac:.1%} of R2C roofline, "
                f"vs_xla_rfft={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    def _end_to_end(n2, b2, iters=20):
        """Reference-style serving loop: host complex in -> forward -> host
        complex out, INCLUDING planar split + H2D + D2H each iteration
        (the reference times exactly this, examples/basic.rs:70-129)."""
        import fft_wgpu_tpu as ftt

        rng = np.random.default_rng(0)
        x = (rng.standard_normal((b2, n2)) + 1j * rng.standard_normal((b2, n2))
             ).astype(np.complex64)
        p = ftt.plan(n2)
        _ = ftt.device_get_complex(p.forward(x))  # warm the jit cache
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = ftt.device_get_complex(p.forward(x))
        dt2 = (time.perf_counter() - t0) / iters
        gb = 2 * 8e-9 * n2 * b2 / dt2
        return f"{dt2*1e3:.3f} ms/iter incl. H2D+D2H ({gb:.3f} GB/s effective over the tunnel)"

    _row("N=2^20 single-shot (fused big kernel, 1-pass roofline)",
         lambda: _1d(1 << 20, 1, 1), budget=900)
    _row("N=2^22 x4 (four-step)", lambda: _1d(1 << 22, 4, 2), budget=900)
    _row("reference shape 2500x512", lambda: _1d(512, 2500, 1))
    _row("N=8192 x 1024 (big-n1 balanced)", lambda: _1d(8192, 1024, 1))
    _row("N=16384 x 1024 (big-n1 balanced)", lambda: _1d(16384, 1024, 1))
    _row("2-D 4096x4096 C2C", lambda: _2d(4096))
    def _c2r(n2, b2):
        from fft_wgpu_tpu.ops.rfft import irfft_last_split
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        nb = n2 // 2 + 1
        Xr = jax.random.normal(jax.random.PRNGKey(5), (b2, nb), jnp.float32)
        Xi = jax.random.normal(jax.random.PRNGKey(6), (b2, nb), jnp.float32)
        raw = lambda a, b: (irfft_last_split(a, b, n2, 1.0 / n2),)
        fn = jax.jit(raw)
        out = fn(Xr, Xi)[0]
        ref = jnp.fft.irfft(jax.lax.complex(Xr, Xi), n=n2, axis=-1)
        err = float(jnp.sqrt(jnp.sum((out - ref) ** 2) / jnp.sum(ref ** 2)))
        dt2 = _device_time(fn, (Xr, Xi))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        frac = 4.0 * (n2 + 2 * nb) * b2 / dt2 / hbm_bandwidth(dev)
        # exact-IO floor: TWO ragged [b, n//2+1] reads -> aligned [b, n]
        copy_s = bound_s = None
        try:
            copy_s = _shapecopy_ms([(b2, nb), (b2, nb)], [(b2, n2)])
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (Xr, Xi))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: jnp.fft.irfft(jax.lax.complex(a, b), n=n2,
                                       axis=-1), (Xr, Xi), dt2)
        return (f"{dt2*1e3:.3f} ms, {frac:.1%} of C2R roofline, "
                f"vs_xla_irfft={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("R2C 4096 x 4096 rows", lambda: _r2c(4096, 4096))
    _row("C2R 4096 x 4096 rows", lambda: _c2r(4096, 4096))

    def _r2c_padded(n2, b2):
        """Padded-spectrum serving form (probe_r45): the numpy-parity
        ragged minor (n/2+1 columns) misaligns every HBM row and costs
        ~1.45x in DMA; round-trip pipelines keep [.., pad_bins(n)]
        end-to-end instead."""
        from fft_wgpu_tpu.ops.rfft import rfft_last_split
        from fft_wgpu_tpu.ops.pallas_fft import pad_bins
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        x = jax.random.normal(jax.random.PRNGKey(17), (b2, n2), jnp.float32)
        raw = lambda v: rfft_last_split(v, None, pad_out=True)
        fn = jax.jit(raw)
        dt2 = _device_time(fn, (x,))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        # roofline vs the same R2C bytes (padding past Nyquist is zeros)
        nb = n2 // 2 + 1
        bw = 4.0 * (n2 + 2 * nb) * b2 / dt2
        frac = bw / hbm_bandwidth(dev)
        Xr, Xi = fn(x)
        ref = jnp.fft.rfft(x, axis=-1)
        err = float(
            jnp.sqrt(jnp.sum((Xr[:, :nb] - ref.real) ** 2
                             + (Xi[:, :nb] - ref.imag) ** 2)
                     / jnp.sum(ref.real ** 2 + ref.imag ** 2)))
        copy_s = bound_s = None
        try:  # aligned [b, n] read -> two aligned [b, pad_bins] writes
            copy_s = _shapecopy_ms([(b2, n2)],
                                   [(b2, pad_bins(n2))] * 2)
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (x,))
        except Exception:
            pass
        stock = _stock_txt(  # honest bar: stock produces the numpy form
            lambda v: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.rfft(v, axis=-1)), (x,), dt2)
        return (f"{dt2*1e3:.3f} ms -> [.., {pad_bins(n2)}], "
                f"{frac:.1%} of R2C roofline, vs_xla_rfft={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    def _c2r_padded(n2, b2):
        from fft_wgpu_tpu.ops.rfft import irfft_last_split
        from fft_wgpu_tpu.ops.pallas_fft import pad_bins
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        nb, npad = n2 // 2 + 1, pad_bins(n2)
        Xr = jax.random.normal(jax.random.PRNGKey(18), (b2, npad),
                               jnp.float32)
        Xi = jax.random.normal(jax.random.PRNGKey(19), (b2, npad),
                               jnp.float32)
        Xr = Xr.at[:, nb:].set(0.0)
        Xi = Xi.at[:, nb:].set(0.0)
        raw = lambda a, b: (irfft_last_split(
            a, b, n2, 1.0 / n2, padded_in=True),)
        fn = jax.jit(raw)
        out = fn(Xr, Xi)[0]
        ref = jnp.fft.irfft(jax.lax.complex(Xr[:, :nb], Xi[:, :nb]),
                            n=n2, axis=-1)
        err = float(jnp.sqrt(jnp.sum((out - ref) ** 2) / jnp.sum(ref ** 2)))
        dt2 = _device_time(fn, (Xr, Xi))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        frac = (4.0 * (n2 + 2 * nb) * b2 / dt2 / hbm_bandwidth(dev))
        copy_s = bound_s = None
        try:  # two aligned [b, npad] reads -> one aligned [b, n] write
            copy_s = _shapecopy_ms([(b2, npad)] * 2, [(b2, n2)])
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (Xr, Xi))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: jnp.fft.irfft(
                jax.lax.complex(a[:, :nb], b[:, :nb]), n=n2, axis=-1),
            (Xr, Xi), dt2)
        return (f"{dt2*1e3:.3f} ms from [.., {npad}], "
                f"{frac:.1%} of C2R roofline, vs_xla_irfft={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("R2C 4096 x 4096 PADDED serving form", lambda: _r2c_padded(4096, 4096))
    _row("C2R 4096 x 4096 PADDED-IN serving form", lambda: _c2r_padded(4096, 4096))

    def _filt(n2, b2):
        """Fused spectral filter loop (ops/fastconv.py): ifft(fft(x)*H)
        as two Pallas passes, the cuFFT-callback analogue."""
        from fft_wgpu_tpu.ops import pallas_fft as pf

        re = jax.random.normal(jax.random.PRNGKey(9), (b2, n2), jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(10), (b2, n2), jnp.float32)
        hr = jax.random.normal(jax.random.PRNGKey(11), (n2,), jnp.float32)
        hi = jax.random.normal(jax.random.PRNGKey(12), (n2,), jnp.float32)

        def fused(a, b):
            Xr, Xi = pf.fft_batched_split(a, b, -1, None)
            return pf.fft_filtered_split(Xr, Xi, hr, hi, +1, 1.0 / n2)

        fn = jax.jit(fused)
        yr, yi = fn(re, im)
        ref = jnp.fft.ifft(jnp.fft.fft(jax.lax.complex(re, im), axis=-1)
                           * jax.lax.complex(hr, hi), axis=-1)
        err = float(jnp.sqrt(
            jnp.sum((yr - jnp.real(ref)) ** 2 + (yi - jnp.imag(ref)) ** 2)
            / jnp.sum(jnp.real(ref) ** 2 + jnp.imag(ref) ** 2)))
        dt2 = _device_time(fn, (re, im))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        copy_s = bound_s = None
        try:
            copy_s = 2 * _shapecopy_ms(_plan2d(b2, n2), _plan2d(b2, n2))
        except Exception:
            pass
        try:
            bound_s = _bound_ms(fused, (re, im))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda Y: (jnp.real(Y), jnp.imag(Y)))(
                jnp.fft.ifft(jnp.fft.fft(jax.lax.complex(a, b), axis=-1)
                             * jax.lax.complex(hr, hi), axis=-1)),
            (re, im), dt2)
        return (f"{dt2*1e3:.3f} ms (= 2 fused passes; composed ops pay a "
                f"3rd HBM trip), vs_xla={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("fused spectral filter 4096 x 4096", lambda: _filt(4096, 4096))

    def _welch_fused(t2, nperseg):
        """Fused segment-spectrum kernel (ops/pallas_welch.py) vs the
        composed frame->window->rfft->|.|^2->mean pipeline at the
        vcheck_r67 shape — VERDICT r4 item 7's >=1.5x target."""
        from fft_wgpu_tpu.ops import pallas_welch as pwl
        from fft_wgpu_tpu.ops import spectral_est as se

        hop = nperseg // 2
        x = jax.random.normal(jax.random.PRNGKey(24), (t2,), jnp.float32)
        win = jnp.asarray(se.get_window("hann", nperseg), jnp.float32)

        fused = jax.jit(lambda v: pwl.welch_accum_split(
            v, win, nperseg, hop, nperseg, "constant")[0])

        def composed_fn(v):
            # explicit composed pipeline (frame -> detrend -> window ->
            # padded rfft -> power -> sum); _spec_segments_split itself
            # now routes through the fused framed-R2C kernel (round-5e),
            # so going through it would not measure the composed cost
            from fft_wgpu_tpu.ops.rfft import rfft_last_split

            fr = se._detrend_seg(se._frame(v, nperseg, hop),
                                 "constant") * win
            Xr, Xi = rfft_last_split(fr, None, pad_out=True)
            return (jnp.sum(Xr * Xr + Xi * Xi, axis=0)[: nperseg // 2 + 1],)

        composed = jax.jit(composed_fn)
        pf_ = fused(x)
        pc_ = composed(x)[0]
        err = float(jnp.linalg.norm(pf_ - pc_) / jnp.linalg.norm(pc_))
        tf = _device_time(lambda v: (fused(v),), (x,))
        tc = _device_time(composed, (x,))
        if tf is None or tc is None:
            raise RuntimeError("profiler captured no device events")
        # the split-spectra sibling (spectrogram/stft building block)
        split = jax.jit(lambda v: pwl.spec_rfft_split(
            v, win, nperseg, hop, nperseg, "constant", pad_out=True))
        ts = _device_time(split, (x,))
        ts_txt = f", framed-R2C split {ts*1e3:.3f} ms" if ts else ""
        return (f"fused {tf*1e3:.3f} ms vs composed {tc*1e3:.3f} ms = "
                f"{tc/tf:.2f}x, parity={err:.2e}{ts_txt} "
                f"(t=2^22, nperseg={nperseg}, hop={hop})")

    _row("fused welch 2^22 x nperseg 4096",
         lambda: _welch_fused(1 << 22, 4096), budget=600)

    def _fftn3d(n3, check=True):
        from fft_wgpu_tpu.ops.nd import fftn_split
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        re = jax.random.normal(jax.random.PRNGKey(13), (n3, n3, n3),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(14), (n3, n3, n3),
                               jnp.float32)
        raw = lambda a, b: fftn_split(a, b, (0, 1, 2), -1, None)
        fn = jax.jit(raw)
        if check:  # 512^3 replicates the cube 4x for the XLA reference —
            out = fn(re, im)  # skip the accuracy cross-check there (the
            ref = jax.jit(    # 256^3 row covers the same code path)
                lambda a, b: jnp.fft.fftn(jax.lax.complex(a, b)))(re, im)
            err = float(jnp.sqrt(jnp.sum(
                (out[0] - jnp.real(ref)) ** 2
                + (out[1] - jnp.imag(ref)) ** 2)
                / jnp.sum(jnp.real(ref) ** 2 + jnp.imag(ref) ** 2)))
            errtxt = f", vs_xla={err:.2e}"
        else:
            errtxt = ""
        dt2 = _device_time(fn, (re, im))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        # roofline convention (VERDICT r4 item 6): 2 HBM passes — the
        # fused trailing-plane pass (axes 1,2) + the tiled axis-0 pass
        frac = 2 * 2 * 8.0 * n3**3 / dt2 / hbm_bandwidth(dev)
        gf = 15.0 * n3**3 * math.log2(n3) / dt2 / 1e9
        copy_s = bound_s = None
        try:
            copy_s = 2 * _shapecopy_ms(_plan2d(n3 * n3, n3),
                                       _plan2d(n3 * n3, n3))
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (re, im))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.fftn(jax.lax.complex(a, b))), (re, im), dt2)
        return (f"{dt2*1e3:.3f} ms, {gf:.0f} GFLOP/s, {frac:.1%} of "
                f"2-pass roofline (fused trailing plane + tiled axis "
                f"pass){errtxt}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("3-D C2C 256^3", lambda: _fftn3d(256), budget=600)
    _row("3-D C2C 512^3", lambda: _fftn3d(512, check=False), budget=600)
    def _vs_xla():
        """Stock XLA jnp.fft at the headline shape vs this framework
        (the jnp_backend value proposition; full table: scripts/
        probe_r36.py + BENCHMARKS.md 'vs stock XLA')."""
        from fft_wgpu_tpu.ops import pallas_fft as pf

        re = jax.random.normal(jax.random.PRNGKey(7), (4096, 4096),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(8), (4096, 4096),
                               jnp.float32)
        xla = jax.jit(lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
            jnp.fft.fft(jax.lax.complex(a, b), axis=-1)))
        ours = jax.jit(lambda a, b: pf.fft_batched_split(a, b, -1))
        tx = _device_time(xla, (re, im))
        to = _device_time(ours, (re, im))
        if tx is None or to is None:
            raise RuntimeError("profiler captured no device events")
        return (f"stock jnp.fft {tx*1e3:.3f} ms vs ours {to*1e3:.3f} ms "
                f"= {tx/to:.2f}x speedup (N=4096 x 4096)")

    _row("vs stock XLA jnp.fft", _vs_xla, budget=600)

    def _bluestein(n2, b2):
        """Non-pow2 prime-capable path: FUSED chirp-z (round 4) — chirp
        multiply + zero-pad ride the forward m-kernel's load stage, the
        filter-spectrum multiply + n-slice + post-chirp ride the inverse
        m-kernel's load/store.  Structural floor = the 2 fused m-passes:
        read n_p + write m, read m + write n_p (planar f32)."""
        from fft_wgpu_tpu.ops.bluestein import _chirp_np, \
            fft_bluestein_split
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        re = jax.random.normal(jax.random.PRNGKey(15), (b2, n2),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(16), (b2, n2),
                               jnp.float32)
        raw = lambda a, b: fft_bluestein_split(a, b, -1)
        fn = jax.jit(raw)
        Xr, Xi = fn(re, im)
        ref = jnp.fft.fft(jax.lax.complex(re, im), axis=-1)
        err = float(jnp.sqrt(
            jnp.sum((Xr - jnp.real(ref)) ** 2 + (Xi - jnp.imag(ref)) ** 2)
            / jnp.sum(jnp.real(ref) ** 2 + jnp.imag(ref) ** 2)))
        dt2 = _device_time(fn, (re, im))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        m = _chirp_np(n2, -1)[4]
        n_p = -(-n2 // 128) * 128
        gf = 5.0 * n2 * math.log2(n2) * b2 / dt2 / 1e9  # n-DFT convention
        frac = 2 * 8.0 * (m + n_p) * b2 / dt2 / hbm_bandwidth(dev)
        copy_s = bound_s = None
        try:  # the 2 fused m-passes: read n_p + write m, read m + write n_p
            copy_s = (_shapecopy_ms(_plan2d(b2, n_p), _plan2d(b2, m))
                      + _shapecopy_ms(_plan2d(b2, m), _plan2d(b2, n_p)))
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (re, im))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.fft(jax.lax.complex(a, b), axis=-1)),
            (re, im), dt2)
        return (f"{dt2*1e3:.3f} ms (m={m}), {gf:.0f} GFLOP/s-equiv, "
                f"{frac:.1%} of fused-2-pass roofline, vs_xla={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("Bluestein n=4097 x 1024", lambda: _bluestein(4097, 1024),
         budget=600)
    _row("Bluestein prime n=4093 x 1024", lambda: _bluestein(4093, 1024),
         budget=600)

    def _general(n2, b2):
        """Composite non-pow2 via the round-4 generic two-factor kernel:
        ONE VMEM-resident pass (public fft routing) — vs Bluestein's two
        fused m-sized passes for the same length."""
        from fft_wgpu_tpu.ops.stockham import fft_last_axis
        from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

        re = jax.random.normal(jax.random.PRNGKey(22), (b2, n2),
                               jnp.float32)
        im = jax.random.normal(jax.random.PRNGKey(23), (b2, n2),
                               jnp.float32)
        raw = lambda a, b: fft_last_axis(a, b, -1)
        fn = jax.jit(raw)
        Xr, Xi = fn(re, im)
        ref = jnp.fft.fft(jax.lax.complex(re, im), axis=-1)
        err = float(jnp.sqrt(
            jnp.sum((Xr - jnp.real(ref)) ** 2 + (Xi - jnp.imag(ref)) ** 2)
            / jnp.sum(jnp.real(ref) ** 2 + jnp.imag(ref) ** 2)))
        dt2 = _device_time(fn, (re, im))
        if dt2 is None:
            raise RuntimeError("profiler captured no device events")
        n_p = -(-n2 // 128) * 128
        # 1 kernel pass + the two n-sized pad/slice boundary passes
        frac = 8.0 * (3 * n_p + n2) * b2 / dt2 / hbm_bandwidth(dev)
        gf = 5.0 * n2 * math.log2(n2) * b2 / dt2 / 1e9
        copy_s = bound_s = None
        try:  # kernel pass [b, n_p] + pad (read n, write n_p) + slice
            copy_s = (_shapecopy_ms(_plan2d(b2, n_p), _plan2d(b2, n_p))
                      + _shapecopy_ms(_plan2d(b2, n2), _plan2d(b2, n_p))
                      + _shapecopy_ms(_plan2d(b2, n_p), _plan2d(b2, n2)))
        except Exception:
            pass
        try:
            bound_s = _bound_ms(raw, (re, im))
        except Exception:
            pass
        stock = _stock_txt(
            lambda a, b: (lambda X: (jnp.real(X), jnp.imag(X)))(
                jnp.fft.fft(jax.lax.complex(a, b), axis=-1)),
            (re, im), dt2)
        return (f"{dt2*1e3:.3f} ms, {gf:.0f} GFLOP/s-equiv, "
                f"{frac:.1%} of 1-pass+pad roofline, vs_xla={err:.2e}"
                + _floors_txt(dt2, copy_s, bound_s) + stock)

    _row("general composite n=4095 x 1024 (one-pass kernel)",
         lambda: _general(4095, 1024), budget=600)
    # 4097 = 17 * 241: rides the round-5 extended factor<=256 envelope
    # (probe_r70/r71) — the public fft no longer pays the two fused
    # Bluestein m=16384 passes for this length (1.553 -> 0.879 ms); the
    # Bluestein rows above still measure the chirp engine itself.
    _row("general composite n=4097 x 1024 ((17,241), ex-Bluestein)",
         lambda: _general(4097, 1024), budget=600)
    _row("general composite n=1000 x 2048 (one-pass kernel)",
         lambda: _general(1000, 2048), budget=600)
    _row("end-to-end 2500x512 (reference loop)", lambda: _end_to_end(512, 2500))


if __name__ == "__main__":
    if "--headline-child" in sys.argv:
        child_main()
    else:
        main()
