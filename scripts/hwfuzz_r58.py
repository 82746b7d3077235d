#!/usr/bin/env python
"""Round-3 hardware shape fuzz (probe 58): sweep unusual shapes and ops
on the REAL TPU backend looking for more latent worker-fault classes
like probe_r57's ragged-edge-block kill (found only on hardware; CPU
interpret and CPU compiled runs never reproduce that class).

Each case prints its tag and FLUSHES before executing, so if the worker
dies the log ends at the culprit.  Every case validates vs numpy.
Complex data crosses the boundary as planar f32 only (CLAUDE.md).

Run: nohup setsid python scripts/hwfuzz_r58.py > /tmp/hwfuzz_r58.out 2>&1 &
"""
import signal
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import fft_wgpu_tpu as ftt
from fft_wgpu_tpu import device_get_complex as dget
from fft_wgpu_tpu import device_put_complex as dput

rng = np.random.default_rng(58)
FAIL = []


def crand(*shape):
    return (rng.standard_normal(shape)
            + 1j * rng.standard_normal(shape)).astype(np.complex64)


def frand(*shape):
    return rng.standard_normal(shape).astype(np.float32)


def case(tag, fn, want, tol=2e-5):
    print(f"RUN  {tag}", flush=True)
    signal.alarm(600)
    try:
        got = fn()
        w = np.asarray(want)
        rel = float(np.linalg.norm(got - w) / max(np.linalg.norm(w), 1e-30))
        ok = rel < tol
        print(f"{'ok  ' if ok else 'FAIL'} {tag}: rel={rel:.2e}", flush=True)
        if not ok:
            FAIL.append(tag)
    except Exception as e:  # noqa: BLE001 — fuzz harness records and moves on
        print(f"FAIL {tag}: {type(e).__name__}: {e}", flush=True)
        FAIL.append(tag)
    finally:
        signal.alarm(0)


signal.signal(signal.SIGALRM,
              lambda s, f: (_ for _ in ()).throw(TimeoutError("alarm")))

# --- tiny n (degenerate chains / single-tile paths) -------------------
for n in (2, 4, 8, 16):
    x = crand(3, n)
    case(f"fft tiny n={n} rows=3", lambda x=x: dget(ftt.fft(x)),
         np.fft.fft(x, axis=-1))
x = crand(5)
case("fft 1-row 1-D n=5 (bluestein)", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x))

# --- single row / single column ---------------------------------------
x = crand(1, 4096)
case("fft rows=1 n=4096", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(4096, 1)
case("fft axis=0 m=1", lambda x=x: dget(ftt.fft(x, axis=0)),
     np.fft.fft(x, axis=0))
r = frand(1, 4096)
case("rfft rows=1", lambda r=r: dget(ftt.rfft(r)), np.fft.rfft(r, axis=-1))

# --- ragged every which way -------------------------------------------
x = crand(129, 1024)
case("fft rows=129 n=1024 (1 over tile)", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(127, 16384)
case("fft rows=127 n=16384 (big-n1)", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(1024, 129)
case("fft axis=0 m=129", lambda x=x: dget(ftt.fft(x, axis=0)),
     np.fft.fft(x, axis=0))
x = crand(7, 33, 512)
case("fft 3-D lead (7,33) n=512", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(3, 100, 256)
case("fft axis=-2 ragged outer", lambda x=x: dget(ftt.fft(x, axis=-2)),
     np.fft.fft(x, axis=-2))
r = frand(100, 16384)
case("rfft rows=100 n=16384", lambda r=r: dget(ftt.rfft(r)),
     np.fft.rfft(r, axis=-1))
sp = np.fft.rfft(frand(100, 16384), axis=-1).astype(np.complex64)
case("irfft rows=100 n=16384",
     lambda sp=sp: np.asarray(ftt.irfft(dput(sp))),
     np.fft.irfft(sp, axis=-1))

# --- non-pow2 / prime / odd -------------------------------------------
x = crand(37, 4097)
case("fft n=4097 rows=37 (czt)", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(5, 4093)
case("fft prime n=4093", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
x = crand(9, 1000)
case("fft n=1000 (2^3*5^3)", lambda x=x: dget(ftt.fft(x)),
     np.fft.fft(x, axis=-1))
r = frand(3, 999)
case("rfft odd n=999", lambda r=r: dget(ftt.rfft(r)),
     np.fft.rfft(r, axis=-1))
sp = np.fft.rfft(frand(3, 999), axis=-1).astype(np.complex64)
case("irfft odd n=999",
     lambda sp=sp: np.asarray(ftt.irfft(dput(sp), n=999)),
     np.fft.irfft(sp, n=999, axis=-1))

# --- n= / s= padding & truncation through the public API --------------
x = crand(10, 300)
case("fft n=512 from 300 (zero-pad)", lambda x=x: dget(ftt.fft(x, n=512)),
     np.fft.fft(x, n=512, axis=-1))
x = crand(10, 700)
case("fft n=512 from 700 (truncate)", lambda x=x: dget(ftt.fft(x, n=512)),
     np.fft.fft(x, n=512, axis=-1))

# --- 2-D / N-D ragged cubes -------------------------------------------
x = crand(130, 130)
case("fft2 130x130", lambda x=x: dget(ftt.fft2(x)), np.fft.fft2(x))
x = crand(3, 257, 384)
case("fft2 batched 257x384", lambda x=x: dget(ftt.fft2(x)),
     np.fft.fft2(x, axes=(-2, -1)))
x = crand(48, 48, 48)
case("fftn 48^3", lambda x=x: dget(ftt.fftn(x)), np.fft.fftn(x))
x = crand(24, 160, 96)
case("fftn 24x160x96", lambda x=x: dget(ftt.fftn(x)), np.fft.fftn(x))
r = frand(60, 60)
case("rfft2 60x60", lambda r=r: dget(ftt.rfft2(r)), np.fft.rfft2(r))
x = crand(40, 40, 40)
case("ifftn 40^3", lambda x=x: dget(ftt.ifftn(x)), np.fft.ifftn(x))

# --- real-input transforms off the beaten track ------------------------
r = frand(300, 512)
sp = np.fft.rfft(r, axis=-1).astype(np.complex64)
case("hfft rows=300",
     lambda sp=sp: np.asarray(ftt.hfft(dput(sp))),
     np.fft.hfft(sp, axis=-1))
case("ihfft rows=300", lambda r=r: dget(ftt.ihfft(r)),
     np.fft.ihfft(r, axis=-1))

# --- DCT/DST ragged -----------------------------------------------------
import scipy.fft as sfft  # noqa: E402 — oracle only

r = frand(300, 512)
for t in (1, 2, 3, 4):
    case(f"dct type={t} rows=300",
         lambda r=r, t=t: np.asarray(ftt.dct(r, type=t)),
         sfft.dct(r.astype(np.float64), type=t, axis=-1))
    case(f"dst type={t} rows=300",
         lambda r=r, t=t: np.asarray(ftt.dst(r, type=t)),
         sfft.dst(r.astype(np.float64), type=t, axis=-1))

# --- signal-layer entry points on ragged shapes -------------------------
import scipy.signal as ss  # noqa: E402 — oracle only

a = frand(3, 1000)
b = frand(1, 77)
case("fftconvolve full (3,1000)x(1,77)",
     lambda a=a, b=b: np.asarray(ftt.fftconvolve(a, b, mode="full")),
     ss.fftconvolve(a.astype(np.float64), b.astype(np.float64),
                    mode="full", axes=-1))
a = frand(200, 130)
case("hilbert rows=200 n=130",
     lambda a=a: dget(ftt.hilbert(a)),
     ss.hilbert(a.astype(np.float64), axis=-1))
sig = frand(3, 5000)
case("stft-istft roundtrip ragged",
     lambda sig=sig: np.asarray(
         ftt.istft(ftt.stft(sig, n_fft=256, hop_length=100), 256, 100,
                   length=5000)),
     sig, tol=1e-4)

print(f"DONE fails={len(FAIL)} {FAIL}", flush=True)
