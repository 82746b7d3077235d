"""Plan-based FFT scheduler (the TPU-native `processor.rs` equivalent).

The reference's public surface is plan-style objects constructed once per
(buffer, fft_len) and replayed cheaply (`Forward::new` / `proc`,
fft_wgpu src/processor.rs:7-159).  Here a :class:`Plan` is constructed once
per transform length; "replay" is calling its jitted executors — XLA caches
the compiled program, which is the TPU analogue of the reference's cached
`ComputePipeline` (processor.rs:161-229).

Executor strategies (the reference's two scheduling strategies — fused
single-dispatch fft4.wgsl vs per-stage dispatch ifft.wgsl, SURVEY §3.2 —
map to):
  * ``"pallas"``  — fused VMEM-resident Pallas kernel (single HBM round trip)
  * ``"fourstep"``— HBM-level Bailey decomposition for transforms beyond VMEM
  * ``"xla"``     — pure-jnp mixed-radix (general fallback, any backend)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.complex_utils import merge, promote_to_split
from ..core.twiddle import FORWARD, INVERSE
from ..ops import stockham

__all__ = ["Plan", "plan", "get_plan"]

# Fused VMEM-resident Pallas kernel envelope — single source of truth is
# ops/pallas_fft.py (the re+im f32 working set must fit VMEM with
# double-buffering headroom); re-exported here for planner callers.
from ..ops.pallas_fft import FUSED_MAX_N, FUSED_MIN_N  # noqa: E402


def _backend() -> str:
    return jax.default_backend()


def _is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


class Plan:
    """FFT plan for 1-D transforms of length ``n`` along the last axis.

    API parity with the reference plan objects (SURVEY §2 C4-C11):
      forward                -> Forward::proc        (processor.rs:110-158)
      inverse                -> Inverse::proc        (processor.rs:293-340, fused 1/N)
      inverse_unnormalized   -> Onlyinverse::proc    (processor.rs:622-669)
      normalize              -> Normalize::proc      (processor.rs:467-504)
    """

    def __init__(self, n: int, *, executor: str = "auto", dtype=jnp.complex64,
                 donate: bool = False, autotune: bool = False):
        if n < 1:
            raise ValueError(f"fft length must be >= 1, got {n}")
        self.n = int(n)
        # The compute path is split re/im float32 with a complex64 facade
        # (CLAUDE.md invariant); other precisions are not silently accepted.
        if jnp.dtype(dtype) != jnp.dtype(jnp.complex64):
            raise ValueError(
                f"unsupported dtype {dtype!r}: plans compute in split-f32 and "
                "return complex64 (TPU has no f64; use dtype=jnp.complex64)"
            )
        self.dtype = jnp.complex64
        if executor not in ("auto", "xla", "pallas", "fourstep", "bigfft",
                            "direct", "pallas:classic", "pallas:dit",
                            "pallas:balanced"):
            raise ValueError(f"unknown executor {executor!r}")
        self.executor = executor
        # autotune=True (FFTW_MEASURE analogue): measure the executor
        # candidates on-device once per (n, batch-rows, axis) and use the
        # winner; executor="auto" heuristics otherwise (plan/autotune.py).
        self.autotune = bool(autotune)
        # donate=True donates the (re, im) input buffers to XLA so replaying
        # the plan allocates nothing new — the TPU analogue of the
        # reference's caller-owned in-place ping-pong buffers
        # (fft_wgpu src/processor.rs:580-586, parity dance :153-157).
        # The caller's input arrays are INVALIDATED by each call.
        self.donate = bool(donate)
        # One compiled executable per (axis, sign, scale) — the TPU analogue
        # of the reference's cached ComputePipeline (processor.rs:28,161-229).
        # jax.jit adds per-shape caching on top.
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------ #
    # executor selection (trace-time; shapes are static under jit)
    # ------------------------------------------------------------------ #
    def _resolve_executor(self) -> str:
        if self.executor != "auto":
            return self.executor
        n = self.n
        if _backend() == "tpu":
            # native C++ planner (the reference's plan-construction role,
            # processor.rs:19-108); python fallback mirrors it exactly
            from ..core.factor import MAX_DIRECT
            from ..ops.bluestein import BLUESTEIN_MIN
            from ..utils import native

            choice = native.plan_choice(
                n, MAX_DIRECT, FUSED_MIN_N, FUSED_MAX_N, BLUESTEIN_MIN
            )
            if choice is not None:
                return choice[0]
            if _is_pow2(n):
                if FUSED_MIN_N <= n <= FUSED_MAX_N:
                    return "pallas"
                if n > FUSED_MAX_N:
                    return "fourstep"
        return "xla"

    # ------------------------------------------------------------------ #
    # split-domain executors (re/im pairs, transform along last axis)
    # ------------------------------------------------------------------ #
    def _execute_split(self, re, im, sign: int, scale, ex: str | None = None):
        if re.shape[-1] != self.n:
            raise ValueError(
                f"plan built for n={self.n}, input last axis is {re.shape[-1]}"
            )
        tuned = ex is not None
        if not tuned:
            ex = self._resolve_executor()
        auto = self.executor == "auto" and not tuned
        if ex == "pallas" and auto:
            rows = 1
            for d in re.shape[:-1]:
                rows *= d
            if 0 < rows < 16:
                # 128-row kernel tiles would be mostly padding
                ex = "xla"
        if ex in ("pallas", "pallas:classic", "pallas:dit",
                  "pallas:balanced"):
            schedule = {"pallas:classic": "classic",
                        "pallas:dit": "dit",
                        "pallas:balanced": "balanced"}.get(ex)
            try:
                from ..ops import pallas_fft
            except ImportError:
                if not (auto or tuned):
                    raise
                ex = "xla"
            else:
                try:
                    return pallas_fft.fft_batched_split(re, im, sign, scale,
                                                        schedule=schedule)
                except pallas_fft.Unsupported:
                    if not (auto or tuned):
                        raise
                    ex = "xla"
        if ex == "bigfft":
            # explicit single-pass whole-row-in-VMEM kernel (TPU);
            # out-of-envelope shapes raise so callers see why
            from ..ops import bigfft

            return bigfft.fft_big_split(re, im, sign, scale)
        if ex == "fourstep":
            try:
                from ..ops import fourstep
            except ImportError:
                if not auto:
                    raise
                ex = "xla"
            else:
                return fourstep.fft_last_axis(re, im, sign, scale)
        if ex == "direct":
            re, im = stockham._dft_direct(re, im, sign)
            return stockham.apply_scale(re, im, scale)
        re, im = stockham.fft_last_axis(re, im, sign)
        return stockham.apply_scale(re, im, scale)

    def _execute_split_axis(self, re, im, sign: int, scale, axis: int,
                            ex: str | None = None):
        """Transform along `axis`.

        axis == -1 uses the row kernel; axis == -2 uses the transpose-free
        sublane-domain kernel on TPU (no data movement at all); any other
        axis moves to the back and uses the row path.
        """
        nd = re.ndim
        ax = axis % nd
        if ax == nd - 1:
            return self._execute_split(re, im, sign, scale, ex)
        exa = ex if ex is not None else self.executor
        if exa in ("auto", "pallas", "pallas:classic", "pallas:dit") \
                and _backend() == "tpu":
            # Any non-minor axis: flatten the trailing dims into one "lane
            # batch" and run the transpose-free sublane-domain kernel — no
            # moveaxis (= no HBM transpose) for ANY axis of an ND transform.
            try:
                from ..ops import pallas_fft
            except ImportError:
                pass
            else:
                try:
                    shape = re.shape
                    if ax == nd - 2:
                        return pallas_fft.fft_axis0_split(re, im, sign, scale)
                    # ax <= nd-3: merge the dims BETWEEN ax and the minor
                    # (a non-minor regroup — free view, unlike the
                    # minor-merging flatten below) and run the axis(-3)
                    # kernel: zero relayouts (probe_r48: the flatten
                    # route's hidden relayout cost a full HBM round trip).
                    mid = 1
                    for d in shape[ax + 1: nd - 1]:
                        mid *= d
                    try:
                        re3 = re.reshape(*shape[: ax + 1], mid, shape[-1])
                        im3 = im.reshape(*shape[: ax + 1], mid, shape[-1])
                        rr, ii = pallas_fft.fft_axis3_split(re3, im3, sign,
                                                            scale)
                        return rr.reshape(shape), ii.reshape(shape)
                    except pallas_fft.Unsupported:
                        pass
                    trail = 1
                    for d in shape[ax + 1:]:
                        trail *= d
                    re3 = re.reshape(*shape[: ax + 1], trail)
                    im3 = im.reshape(*shape[: ax + 1], trail)
                    rr, ii = pallas_fft.fft_axis0_split(re3, im3, sign, scale)
                    return rr.reshape(shape), ii.reshape(shape)
                except pallas_fft.Unsupported:
                    pass
        re = jnp.moveaxis(re, ax, -1)
        im = jnp.moveaxis(im, ax, -1)
        re, im = self._execute_split(re, im, sign, scale, ex)
        return jnp.moveaxis(re, -1, ax), jnp.moveaxis(im, -1, ax)

    # ------------------------------------------------------------------ #
    # public complex-facade methods
    # ------------------------------------------------------------------ #
    def _tuned_for(self, shape, axis: int):
        """Measured executor for this shape (autotune=True, TPU, executor
        'auto'); None = use the static heuristics."""
        if not self.autotune or self.executor != "auto":
            return None
        if _backend() != "tpu" or shape[axis] != self.n:
            return None
        from . import autotune

        return autotune.measure_executor(self, tuple(shape), axis)

    def _jitted(self, axis: int, sign: int, scale, ex: str | None = None):
        """Cached jitted executor: (re, im) real arrays -> complex64.

        The whole transform — axis moves, all stages, scaling, and the
        complex merge — is one compiled program.  Real-valued at the call
        boundary and complex-valued at the return: complex arrays never
        cross host->device (unsupported on some TPU runtimes), while the
        returned device-resident complex64 composes freely under jit.
        """
        key = (axis, sign, scale, ex)
        fn = self._jit_cache.get(key)
        if fn is None:

            def impl(re, im):
                moved = axis not in (-1, re.ndim - 1)
                if moved:
                    re = jnp.moveaxis(re, axis, -1)
                    im = jnp.moveaxis(im, axis, -1)
                re, im = self._execute_split(re, im, sign, scale, ex)
                if moved:
                    re = jnp.moveaxis(re, -1, axis)
                    im = jnp.moveaxis(im, -1, axis)
                return merge(re, im)

            if self.donate:
                fn = jax.jit(impl, donate_argnums=(0, 1))
            else:
                fn = jax.jit(impl)
            self._jit_cache[key] = fn
        return fn

    def _run(self, x, axis: int, sign: int, scale):
        re, im = promote_to_split(x)
        if re.shape[axis] != self.n:
            raise ValueError(
                f"plan built for n={self.n}, input axis {axis} has length "
                f"{re.shape[axis]}"
            )
        ex = self._tuned_for(re.shape, axis)
        return self._jitted(axis, sign, scale, ex)(re, im)

    def _jitted_split(self, axis: int, sign: int, scale,
                      ex: str | None = None):
        """Cached jitted executor in the SPLIT domain: (re, im) -> (re, im).

        This is the form where donate=True achieves true in-place replay —
        the f32 outputs alias the donated f32 inputs (the complex-facade
        methods cannot alias: their complex64 output has a different
        dtype, so XLA declines the donation with a warning)."""
        key = ("split", axis, sign, scale, ex)
        fn = self._jit_cache.get(key)
        if fn is None:

            def impl(re, im):
                return self._execute_split_axis(re, im, sign, scale, axis, ex)

            if self.donate:
                fn = jax.jit(impl, donate_argnums=(0, 1))
            else:
                fn = jax.jit(impl)
            self._jit_cache[key] = fn
        return fn

    def forward_split(self, re, im, axis: int = -1):
        """Forward FFT on a split (re, im) float32 pair -> split pair.

        The zero-copy serving form: with donate=True the outputs reuse the
        input buffers (the reference's caller-owned ping-pong buffers,
        processor.rs:580-586); the inputs are INVALIDATED."""
        ex = self._tuned_for(jnp.shape(re), axis)
        return self._jitted_split(axis, FORWARD, None, ex)(re, im)

    def inverse_split(self, re, im, axis: int = -1):
        """Inverse FFT with fused 1/N on a split pair -> split pair."""
        ex = self._tuned_for(jnp.shape(re), axis)
        return self._jitted_split(axis, INVERSE, 1.0 / self.n, ex)(re, im)

    def inverse_unnormalized_split(self, re, im, axis: int = -1):
        """Unnormalized inverse on a split pair -> split pair."""
        ex = self._tuned_for(jnp.shape(re), axis)
        return self._jitted_split(axis, INVERSE, None, ex)(re, im)

    def forward(self, x, axis: int = -1):
        """Forward FFT, unscaled (reference Forward, processor.rs:7-159)."""
        return self._run(x, axis, FORWARD, None)

    def inverse(self, x, axis: int = -1):
        """Inverse FFT with fused 1/N (reference Inverse — the 1/N division
        is fused into the last butterfly stage, ifft.wgsl:65-74; here it is
        folded into the executor epilogue)."""
        return self._run(x, axis, INVERSE, 1.0 / self.n)

    def inverse_unnormalized(self, x, axis: int = -1):
        """Inverse FFT without the 1/N scale (reference Onlyinverse,
        processor.rs:566-670)."""
        return self._run(x, axis, INVERSE, None)

    def normalize(self, x, axis: int = -1):
        """Standalone 1/N scaling pass (reference Normalize,
        processor.rs:409-505; normalize.wgsl:10-11)."""
        del axis  # elementwise — axis kept for API symmetry
        re, im = promote_to_split(x)
        fn = self._jit_cache.get("normalize")
        if fn is None:
            s = 1.0 / self.n

            def impl(re, im):
                return merge(re * jnp.float32(s), im * jnp.float32(s))

            fn = jax.jit(impl)
            self._jit_cache["normalize"] = fn
        return fn(re, im)

    def warmup(self, batch_shape=(), axis: int = -1):
        """Ahead-of-time compile every executor for a given batch shape —
        the serving-path analogue of the reference's plan construction
        doing all pipeline compilation up front (processor.rs:19-108).
        Returns self for chaining."""
        shape = tuple(batch_shape) + (self.n,)
        for sign, scale in (
            (FORWARD, None),
            (INVERSE, 1.0 / self.n),
            (INVERSE, None),
        ):
            # fresh buffers per call: donate=True plans invalidate their
            # inputs on backends that honor donation, and the two donated
            # args must not alias each other
            re = jnp.zeros(shape, jnp.float32)
            im = jnp.zeros(shape, jnp.float32)
            jax.block_until_ready(self._jitted(axis, sign, scale)(re, im))
            # the split-domain executors are the zero-copy serving form —
            # warm them too (they are distinct compiled programs)
            re = jnp.zeros(shape, jnp.float32)
            im = jnp.zeros(shape, jnp.float32)
            jax.block_until_ready(
                self._jitted_split(axis, sign, scale)(re, im))
        return self

    def __repr__(self):
        return f"Plan(n={self.n}, executor={self.executor!r})"


def plan(n: int, **kw) -> Plan:
    """Construct an FFT plan (`Forward::new` analogue, processor.rs:19-108)."""
    return Plan(n, **kw)


@functools.lru_cache(maxsize=512)
def get_plan(n: int, executor: str = "auto") -> Plan:
    """Module-level plan cache used by the functional API (fft/ifft/...)."""
    return Plan(n, executor=executor)
