"""Command-line entry: ``python -m fft_wgpu_tpu <cmd>``.

The reference's binary entry (fft_wgpu src/main.rs:1-6) runs one hard-
coded demo; this exposes the framework's operational surface instead:

    info         device/backend/roofline summary (one JSON line)
    selftest     quick oracle check of the core paths on this backend
    export-plan  serialize a plan's executors to an AOT artifact
    bench        full benchmark harness (delegates to bench.py)
    tune         measure balanced-split candidates for this device and
                 persist the winners (plan/autotune.tune_balanced)
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_info(args) -> int:
    import jax

    import fft_wgpu_tpu as ftt
    from fft_wgpu_tpu.utils.roofline import hbm_bandwidth

    dev = jax.devices()[0]
    info = {
        "version": ftt.__version__,
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "device_count": jax.device_count(),
        "hbm_bandwidth_GBps": round(hbm_bandwidth(dev) / 1e9, 1),
    }
    print(json.dumps(info))
    return 0


def _cmd_selftest(args) -> int:
    import numpy as np

    import fft_wgpu_tpu as ftt

    rng = np.random.default_rng(0)
    ok = True

    def check(tag, got, want, tol=1e-5):
        nonlocal ok
        rel = float(np.linalg.norm(np.asarray(got) - want)
                    / np.linalg.norm(want))
        good = rel < tol
        ok &= good
        print(f"  {tag}: rel={rel:.2e} {'ok' if good else 'FAIL'}")

    n = args.n
    x = (rng.standard_normal((8, n)) + 1j * rng.standard_normal((8, n))
         ).astype(np.complex64)
    p = ftt.plan(n)
    check("plan.forward", ftt.device_get_complex(p.forward(x)),
          np.fft.fft(x, axis=-1))
    check("plan roundtrip",
          ftt.device_get_complex(p.inverse(p.forward(x))), x)
    xr = rng.standard_normal((8, n)).astype(np.float32)
    check("rfft", ftt.device_get_complex(ftt.rfft(xr)),
          np.fft.rfft(xr, axis=-1))
    check("dct-II", np.asarray(ftt.dct(xr)),
          __import__("scipy.fft", fromlist=["dct"]).dct(xr), tol=1e-4)
    import scipy.signal as sig  # scipy is already required above

    sperseg = min(512, n)
    sx = rng.standard_normal(16 * sperseg).astype(np.float32)
    f1, p1 = ftt.welch(sx, nperseg=sperseg)
    f2, p2 = sig.welch(sx, nperseg=sperseg)
    check("welch (fused on TPU)", np.asarray(p1), p2, tol=1e-4)
    print("selftest:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def _cmd_export_plan(args) -> int:
    import fft_wgpu_tpu as ftt

    p = ftt.plan(args.n)
    ftt.export_plan(p, args.out, batch_shape=(args.batch,))
    print(f"exported plan(n={args.n}, batch={args.batch}) -> {args.out}")
    return 0


def _cmd_bench(args) -> int:
    import os
    import subprocess

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "bench.py")
    if not os.path.exists(path):
        print("bench.py not found (the benchmark harness ships with the "
              "repo checkout, not the installed package)", file=sys.stderr)
        return 2
    return subprocess.run([sys.executable, path]).returncode


def _cmd_tune(args) -> int:
    from fft_wgpu_tpu.plan.autotune import (tune_ax0_tile, tune_balanced,
                                            tune_fused_plane)
    from fft_wgpu_tpu.utils.io import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    rc = 0
    for n in args.n:
        try:
            best = tune_balanced(n, rows=args.rows)
            print(f"n={n}: {best}")
        except (RuntimeError, ValueError) as e:
            print(f"n={n}: {e}", file=sys.stderr)
            rc = 1
    if args.extras:
        try:
            lim = tune_fused_plane()
            print(f"fused-plane envelope: {lim}")
            for n in (256, 512, 1024):
                lt = tune_ax0_tile(n)
                print(f"ax0 n={n}: lane tile {lt}")
        except RuntimeError as e:
            print(f"extras: {e}", file=sys.stderr)
            rc = 1
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="python -m fft_wgpu_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info", help="device/backend summary (JSON)")
    st = sub.add_parser("selftest", help="quick oracle check")
    st.add_argument("--n", type=int, default=1024)
    ep = sub.add_parser("export-plan", help="AOT plan artifact")
    ep.add_argument("n", type=int)
    ep.add_argument("out")
    ep.add_argument("--batch", type=int, default=8)
    sub.add_parser("bench", help="full benchmark harness")
    tn = sub.add_parser("tune", help="measure + persist balanced splits "
                                     "for this device")
    tn.add_argument("n", type=int, nargs="+")
    tn.add_argument("--rows", type=int, default=1024)
    tn.add_argument("--extras", action="store_true",
                    help="also tune the ax0 lane tiles + fused-plane "
                         "envelope for this device kind")
    args = ap.parse_args(argv)
    return {"info": _cmd_info, "selftest": _cmd_selftest,
            "export-plan": _cmd_export_plan, "bench": _cmd_bench,
            "tune": _cmd_tune}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
