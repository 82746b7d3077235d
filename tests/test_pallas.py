"""Fused Pallas kernel, exercised in interpret mode on CPU.

Interpret-mode execution is this framework's race/sanity checker for kernel
logic (the role the reference leaves to WGSL implicit bounds clamping,
SURVEY §5) — the real-hardware path is exercised by bench.py on TPU.
"""

import numpy as np
import pytest

from fft_wgpu_tpu.ops import pallas_fft


def crand(rng, *shape):
    return (rng.standard_normal(shape) + 1j * rng.standard_normal(shape)).astype(
        np.complex64
    )


def run(x, sign, scale=None, **kw):
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    rr, ii = pallas_fft.fft_batched_split(re, im, sign, scale, interpret=True, **kw)
    return np.asarray(rr) + 1j * np.asarray(ii)


@pytest.mark.parametrize("n", [256, 512, 1024, 4096, 16384])
def test_forward_matches_numpy(n, rng, assert_close):
    x = crand(rng, 4, n)
    assert_close(run(x, -1), np.fft.fft(x, axis=-1), what=f"(n={n})")


@pytest.mark.parametrize("n", [512, 4096])
def test_inverse_with_folded_scale(n, rng, assert_close):
    x = crand(rng, 3, n)
    assert_close(run(x, +1, 1.0 / n), np.fft.ifft(x, axis=-1), what=f"(n={n})")
    assert_close(run(x, +1, None), np.fft.ifft(x, axis=-1) * n, what=f"(n={n})")


def test_ortho_scale_folded(rng, assert_close):
    n = 1024
    x = crand(rng, 2, n)
    assert_close(run(x, -1, n**-0.5), np.fft.fft(x, axis=-1, norm="ortho"))


def test_row_tile_padding(rng, assert_close):
    # rows not a multiple of the row tile -> padded grid, trimmed output
    x = crand(rng, 5, 512)
    assert_close(run(x, -1, row_tile=4), np.fft.fft(x, axis=-1))
    x1 = crand(rng, 512)  # single row, no leading dims
    assert_close(run(x1, -1), np.fft.fft(x1))


def test_leading_dims_flattened(rng, assert_close):
    x = crand(rng, 2, 3, 256)
    assert_close(run(x, -1), np.fft.fft(x, axis=-1))


def test_unsupported_shapes_raise():
    rng = np.random.default_rng(0)
    for n in [64, 32768, 120, 512 + 128]:  # small, big, non-pow2, non-pow2
        x = crand(rng, 2, n)
        with pytest.raises(pallas_fft.Unsupported):
            run(x, -1)


def test_n128_single_stage(rng, assert_close):
    # n=128 degenerates to the single lane-factor DFT stage
    x = crand(rng, 4, 128)
    assert_close(run(x, -1), np.fft.fft(x, axis=-1))


@pytest.mark.parametrize("shape", [(512, 100), (3, 1024, 130), (4096, 128)])
def test_axis0_kernel_matches_numpy(shape, rng, assert_close):
    x = crand(rng, *shape)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    rr, ii = pallas_fft.fft_axis0_split(re, im, -1, None, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii), np.fft.fft(x, axis=-2))
    n = shape[-2]
    rr, ii = pallas_fft.fft_axis0_split(re, im, +1, 1.0 / n, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii), np.fft.ifft(x, axis=-2))


@pytest.mark.parametrize(
    "shape",
    [
        (512, 256),       # pipe: two 128-lane halves
        (2, 256, 384),    # lanes not a 256-multiple: classic at 384
        (128, 300),       # ragged lanes: padded to 384 whole tiles
                          # (ragged edge blocks fault the TPU worker —
                          # probe_r57 — so the core pads, never masks)
        (512, 320),       # ragged lanes: padded to 384
        (2, 1024, 256),   # NOT in _PIPE_AX0: classic route at >=256 lanes
    ],
)
def test_axis0_pipe_routing_matches_numpy(shape, rng, assert_close):
    """The lane-pipelined ax0 form (probe_r54) through production
    routing: n in _PIPE_AX0 with >= 256 lanes takes the two-half kernel;
    everything else keeps the classic path."""
    x = crand(rng, *shape)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    rr, ii = pallas_fft.fft_axis0_split(re, im, -1, None, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii), np.fft.fft(x, axis=-2))
    n = shape[-2]
    rr, ii = pallas_fft.fft_axis0_split(re, im, +1, 1.0 / n, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii), np.fft.ifft(x, axis=-2))


def test_axis0_kernel_unsupported():
    rng = np.random.default_rng(0)
    x = crand(rng, 100, 64)  # 100 not in envelope
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft.fft_axis0_split(
            np.float32(x.real), np.float32(x.imag), -1, None, interpret=True
        )


def test_rows_transposed_kernel(rng, assert_close):
    # the two-pass four-step second stage: rows FFT + transposed output
    x = crand(rng, 3, 200, 512)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    rr, ii = pallas_fft.fft_rows_transposed_split(re, im, -1, None, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    want = np.swapaxes(np.fft.fft(x, axis=-1), -1, -2)
    assert_close(got, want)


def test_rows_transposed_with_outer_twiddle(rng, assert_close):
    # full two-pass four-step at n = 512*512 = 2^18, checked vs numpy
    n1 = n2 = 512
    n = n1 * n2
    x = crand(rng, n)
    a = x.reshape(n1, n2)
    b = np.fft.fft(a, axis=0)  # stage-1 column FFT
    rr, ii = pallas_fft.fft_rows_transposed_split(
        np.ascontiguousarray(b.real, np.float32),
        np.ascontiguousarray(b.imag, np.float32),
        -1,
        None,
        outer=(n1, n),
        interpret=True,
    )
    got = (np.asarray(rr) + 1j * np.asarray(ii)).reshape(n)
    assert_close(got, np.fft.fft(x), what="(two-pass 2^18)")


def test_fft2_fused_plane(rng, assert_close):
    # single-round-trip fused plane kernel vs numpy.fft2, batched + plain
    for shape in ((2, 256, 256), (128, 512), (3, 128, 128)):
        x = crand(rng, *shape)
        re = np.ascontiguousarray(x.real, np.float32)
        im = np.ascontiguousarray(x.imag, np.float32)
        rr, ii = pallas_fft.fft2_fused_split(re, im, -1, None,
                                             interpret=True)
        got = np.asarray(rr) + 1j * np.asarray(ii)
        assert_close(got, np.fft.fft2(x), what=f"fft2 fused {shape}")
    # inverse with folded scale
    x = crand(rng, 2, 256, 128)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    Xr, Xi = pallas_fft.fft2_fused_split(re, im, -1, None, interpret=True)
    br, bi = pallas_fft.fft2_fused_split(Xr, Xi, +1, 1.0 / (256 * 128),
                                         interpret=True)
    back = np.asarray(br) + 1j * np.asarray(bi)
    assert_close(back, x, what="fft2 fused roundtrip")


def test_fft2_fused_envelope():
    r = np.zeros((8, 64, 256), np.float32)  # A=64 < 128
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft.fft2_fused_split(r, r, -1, interpret=True)
    r = np.zeros((2, 2048, 2048), np.float32)  # plane too big for VMEM
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft.fft2_fused_split(r, r, -1, interpret=True)


def test_rows_transposed_outer_tw_forms(rng, assert_close, monkeypatch):
    # factored outer four-step twiddle (production, probe_r40: 1.2x on
    # hardware) must agree with the direct per-step [*, n] table, on both
    # the balanced (4096 in _BALANCED) and classic kernels
    for n1, n2 in ((128, 4096), (256, 256)):
        n = n1 * n2
        x = crand(rng, n1, n2)
        b = np.fft.fft(x.reshape(n1, n2), axis=0)
        args = (np.ascontiguousarray(b.real, np.float32),
                np.ascontiguousarray(b.imag, np.float32))
        outs = {}
        for form in ("factored", "direct"):
            monkeypatch.setattr(pallas_fft, "OUTER_TW_FORM", form)
            rr, ii = pallas_fft.fft_rows_transposed_split(
                *args, -1, None, outer=(n1, n), interpret=True)
            outs[form] = np.asarray(rr) + 1j * np.asarray(ii)
        want = np.fft.fft(x.reshape(n))
        assert_close(outs["factored"].reshape(n), want,
                     what=f"outer factored n2={n2}")
        assert_close(outs["factored"], outs["direct"],
                     what=f"outer factored vs direct n2={n2}")


def test_fft2_two_pass(rng, assert_close):
    x = crand(rng, 3, 256, 512)
    re = np.ascontiguousarray(x.real, np.float32)
    im = np.ascontiguousarray(x.imag, np.float32)
    rr, ii = pallas_fft.fft2_split(re, im, -1, None, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii),
                 np.fft.fft2(x, axes=(-2, -1)))
    n_tot = 256 * 512
    rr, ii = pallas_fft.fft2_split(re, im, +1, 1.0 / n_tot, interpret=True)
    assert_close(np.asarray(rr) + 1j * np.asarray(ii),
                 np.fft.ifft2(x, axes=(-2, -1)))


@pytest.mark.parametrize("schedule", ["classic", "balanced", "dit"])
@pytest.mark.parametrize("n", [512, 1024, 2048, 4096])
def test_explicit_row_schedules(n, schedule, rng, assert_close):
    """All three row schedules (lane-split classic, transpose-in balanced,
    sublane DIT chain) agree with numpy, forward and folded-scale inverse."""
    x = crand(rng, 3, n)
    assert_close(run(x, -1, schedule=schedule), np.fft.fft(x, axis=-1),
                 what=f"(n={n},{schedule})")
    assert_close(run(x, +1, 1.0 / n, schedule=schedule),
                 np.fft.ifft(x, axis=-1), what=f"(n={n},{schedule})")


def test_balanced_unsupported_n():
    rng = np.random.default_rng(0)
    x = crand(rng, 2, 256)  # 256 has no balanced split (copy-floor regime)
    with pytest.raises(pallas_fft.Unsupported):
        run(x, -1, schedule="balanced")


def test_vpu_dft_leading_chains(rng, assert_close):
    """The MXU-free VPU butterfly chains (_vpu_dft_leading) for every
    stage-1 factor table entry, incl. the 3-stage (4,4,4) — pure jnp."""
    import jax.numpy as jnp

    from fft_wgpu_tpu.ops import pallas_fft as pf

    cases = list(pf._VPU_S1_FACTORS.items())
    cases += [(n1, f) for (n1, _, f) in pf._BALANCED.values()]
    cases += [(64, (8, 8)), (64, (2, 4, 8)), (32, (2, 4, 4))]
    for S, factors in cases:
        x = (rng.standard_normal((S, 3)) + 1j * rng.standard_normal((S, 3))
             ).astype(np.complex64)
        for sign in (-1, +1):
            rr, ri = pf._vpu_dft_leading(
                jnp.asarray(x.real), jnp.asarray(x.imag), S, sign, factors)
            got = np.asarray(rr) + 1j * np.asarray(ri)
            want = np.fft.fft(x, axis=0) if sign == -1 else \
                np.fft.ifft(x, axis=0) * S
            assert_close(got, want, what=f"vpu chain S={S} {factors} {sign}")


def test_dft_sublane_chain_all_schedules(rng, assert_close):
    """Every _dit_schedule entry (incl. the f=2 and f=8 VPU butterflies
    used only by the big kernel's S=2048/8192 chains) vs numpy — plain
    jnp on CPU, no Pallas needed."""
    import jax.numpy as jnp

    from fft_wgpu_tpu.ops import pallas_fft as pf

    for S in [128, 256, 512, 1024, 2048, 4096, 8192, 16384]:
        x = (rng.standard_normal((S, 2)) + 1j * rng.standard_normal((S, 2))
             ).astype(np.complex64)
        rr, ri = pf._dft_sublane_chain(
            jnp.asarray(x.real), jnp.asarray(x.imag), S, -1)
        got = np.asarray(rr) + 1j * np.asarray(ri)
        assert_close(got, np.fft.fft(x, axis=0), what=f"chain S={S}")


@pytest.mark.parametrize("n,split", [
    (512, (16, 32, (4, 4))),
    (2048, (32, 64, (4, 8))),
    (4096, (64, 64, (4, 8, 2))),    # the shipped pins (incl. the f=2
    (8192, (128, 64, (4, 8, 4))),   # stage), plus one non-default
    (4096, (64, 64, (4, 4, 4))),
])
def test_c2r_balanced_chain_stage_a(n, split, rng, assert_close, monkeypatch):
    """C2R stage A as a zero-extended VPU chain (probe_r30) matches the
    realcat stage A and numpy, in interpret mode."""
    import jax.numpy as jnp

    monkeypatch.setitem(pallas_fft._BALANCED_C2R, n, split)
    Z = crand(rng, 3, n // 2 + 1)
    want = np.fft.irfft(Z, n=n)
    got = pallas_fft._irfft_rows_core(
        jnp.asarray(Z.real), jnp.asarray(Z.imag), n, scale=1.0 / n,
        interpret=True)
    assert_close(got, want, what=f"(n={n}, split={split})")


@pytest.mark.parametrize("n", [8192, 16384])
def test_rows_transposed_big_n1_entries(n, rng, assert_close):
    """The rows_t kernel shares _BALANCED, so the big-n1 (256,*) pins
    (probe_r29/r31) must also be exact through the transposed path
    (feeds fft2 and four-step pass 2)."""
    import jax.numpy as jnp

    x = crand(rng, 2, n)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_rows_transposed_split(re, im, -1, None,
                                                  interpret=True)
    got = (np.asarray(rr) + 1j * np.asarray(ii)).T
    assert_close(got, np.fft.fft(x), what=f"rows_t n={n}")


@pytest.mark.parametrize("n", [8192, 16384])
def test_ax0_kernel_at_big_n(n, rng, assert_close):
    """axis(-2) kernel at the sizes whose row pins changed (its own
    _choose_split is independent, but cover the sizes)."""
    import jax.numpy as jnp

    x = crand(rng, n, 4)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_axis0_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=0), what=f"ax0 n={n}")


@pytest.mark.parametrize("n", [512, 1024, 2048, 4096])
def test_r2c_padded_serving_form(n, rng, assert_close):
    """pad_out=True writes [.., pad_bins(n)] with EXACT zeros past bin
    n//2 (probe_r45: the ragged n/2+1 minor cost 1.45x on HBM stride
    alignment); values match the unpadded form bit-for-bit."""
    import jax.numpy as jnp

    x = rng.standard_normal((5, n)).astype(np.float32)
    mp = n // 2 + 1
    mb = pallas_fft.pad_bins(n)
    pr, pi = pallas_fft._rfft_rows_core(jnp.asarray(x), pad_out=True,
                                        interpret=True)
    assert pr.shape == (5, mb)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(pr[:, :mp]) + 1j * np.asarray(pi[:, :mp])
    assert_close(got, want, what=f"padded R2C n={n}")
    assert np.all(np.asarray(pr[:, mp:]) == 0.0)
    assert np.all(np.asarray(pi[:, mp:]) == 0.0)


@pytest.mark.parametrize("n", [512, 1024, 2048, 4096])
def test_c2r_padded_in_round_trip(n, rng, assert_close):
    """irfft(padded_in=True) consumes the padded serving form directly
    (no input pad pass) and the padded round trip is exact; garbage in
    the pad columns is self-masked by the kernel."""
    import jax.numpy as jnp

    x = rng.standard_normal((4, n)).astype(np.float32)
    pr, pi = pallas_fft._rfft_rows_core(jnp.asarray(x), pad_out=True,
                                        interpret=True)
    back = pallas_fft._irfft_rows_core(pr, pi, n, scale=1.0 / n,
                                       padded_in=True, interpret=True)
    assert_close(np.asarray(back), x, what=f"padded round trip n={n}")

    # defense: garbage pad columns must not leak into the output
    mp = n // 2 + 1
    g = jnp.concatenate(
        [pr[:, :mp], 1e6 * jnp.ones((4, pr.shape[1] - mp), jnp.float32)],
        axis=1)
    back2 = pallas_fft._irfft_rows_core(g, g, n, scale=1.0 / n,
                                        padded_in=True, interpret=True)
    # imag garbage also injected; only bins <= n/2 may contribute
    want2 = np.fft.irfft(
        np.asarray(pr[:, :mp]) + 1j * np.asarray(pr[:, :mp]), n=n)
    assert_close(np.asarray(back2), want2, what=f"pad-mask n={n}")


@pytest.mark.parametrize("rows", [256, 300])
def test_r2c_c2r_pipe_routing(rows, rng, assert_close):
    """The two-half pipelined R2C/C2R forms (probe_r55) engage through
    production routing at >= 256 rows.  Ragged batches are PADDED to
    whole tiles (ragged edge blocks fault the TPU worker — probe_r57):
    rows=300 pads to 384 on the plain kernel (less waste than the 256
    pipe tile) and must still match numpy + round-trip exactly."""
    import jax.numpy as jnp

    n = 512
    assert n in pallas_fft._PIPE_R2C and n in pallas_fft._PIPE_C2R
    x = rng.standard_normal((rows, n)).astype(np.float32)
    mp = n // 2 + 1
    pr, pi = pallas_fft._rfft_rows_core(jnp.asarray(x), pad_out=True,
                                        interpret=True)
    want = np.fft.rfft(x, axis=-1)
    got = np.asarray(pr[:, :mp]) + 1j * np.asarray(pi[:, :mp])
    assert_close(got, want, what=f"pipe R2C rows={rows}")
    assert np.all(np.asarray(pr[:, mp:]) == 0.0)
    back = pallas_fft._irfft_rows_core(pr, pi, n, scale=1.0 / n,
                                       padded_in=True, interpret=True)
    assert_close(np.asarray(back), x, what=f"pipe C2R rows={rows}")


@pytest.mark.parametrize("rows", [256, 300, 400, 512])
def test_rows_pipe_routing(rows, rng, assert_close):
    """C2C routing across the ragged-batch pad logic: rows=256/512 run
    the pipe2 form on exact blocks, rows=300 pads to 384 on the plain
    kernel (less pad waste than a 256 tile), rows=400 pads to 512 and
    STILL runs pipe2 (equal pad either way — _pick_pipe_tile).  Ragged
    edge blocks are never presented to Mosaic (they fault the TPU
    worker — probe_r57).  All routes must match numpy."""
    n = 512
    assert n in pallas_fft._PIPE2
    x = crand(rng, rows, n)
    assert_close(run(x, -1), np.fft.fft(x, axis=-1), what=f"rows={rows}")
    assert_close(run(x, +1, 1.0 / n), np.fft.ifft(x, axis=-1),
                 what=f"rows={rows} inverse")


def test_r2c_padded_grad(rng, assert_close):
    """jax.grad flows through the padded serving forms (linear_call
    transposes handle the pad columns)."""
    import jax
    import jax.numpy as jnp

    n = 512
    x = jnp.asarray(rng.standard_normal((2, n)).astype(np.float32))

    def loss(v):
        pr, pi = pallas_fft.rfft_rows_split(v, pad_out=True,
                                            interpret=True)
        y = pallas_fft.irfft_rows_split(pr, pi, n, 1.0 / n,
                                        padded_in=True, interpret=True)
        return jnp.sum(y ** 2) + jnp.sum(pr[:, :5] ** 2)

    g = jax.grad(loss)(x)
    eps = 1e-3
    d = np.zeros((2, n), np.float32)
    d[0, 7] = 1.0
    num = (loss(x + eps * d) - loss(x - eps * d)) / (2 * eps)
    assert abs(float(g[0, 7]) - float(num)) < 5e-2 * max(
        1.0, abs(float(num)))


@pytest.mark.parametrize("shape", [(256, 16, 256), (2, 512, 8, 128),
                                   (1024, 8, 128)])
def test_axis3_kernel(shape, rng, assert_close):
    """Axis(-3) kernel: transform down the leading axis of [.., n, Y, Z]
    straight from the rank-3 tiled layout (probe_r48 — the flatten route
    paid a hidden XLA relayout worth a full HBM round trip)."""
    import jax.numpy as jnp

    x = crand(rng, *shape)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_axis3_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=-3), what=f"ax3 {shape}")
    # inverse with folded scale
    n = shape[-3]
    br, bi = pallas_fft.fft_axis3_split(rr, ii, +1, 1.0 / n,
                                        interpret=True)
    back = np.asarray(br) + 1j * np.asarray(bi)
    assert_close(back, x, what=f"ax3 roundtrip {shape}")


@pytest.mark.parametrize("shape", [(512, 16, 128), (512, 24, 128),
                                   (256, 40, 128)])
def test_axis3_pipe_routing(shape, rng, assert_close):
    """The sub-tile-pipelined ax3 form (probe_r54) through production
    routing: n in _PIPE_AX3 with Y a 16-multiple takes the two-half
    kernel; Y = 24/40 (8-multiples only) falls back to the plain st=8
    form on the same sizes."""
    import jax.numpy as jnp

    x = crand(rng, *shape)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_axis3_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=-3), what=f"ax3 pipe {shape}")


def test_axis3_unsupported_shapes():
    import jax.numpy as jnp

    r = jnp.zeros((512, 9, 128), jnp.float32)  # Y not a sublane multiple
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_axis3_core(r, r, -1, interpret=True)
    r = jnp.zeros((512, 8, 100), jnp.float32)  # Z not a lane multiple
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_axis3_core(r, r, -1, interpret=True)


# ------------------------------------------------------------------ #
# Round 4: generic composite-n kernels
# ------------------------------------------------------------------ #

@pytest.mark.parametrize("n", [1000, 4095, 640])
def test_rows_general_composite(n, rng, assert_close):
    """Single-pass generic two-factor kernel for composite non-pow2 n
    (round 4): oracle + ragged-batch edge tiling."""
    import jax.numpy as jnp

    x = crand(rng, 5, n)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_rows_general_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=-1), what=f"general n={n}")


def test_rows_general_envelope():
    """Prime n and >256-prime-factor n must raise (primes > 256 ride
    Bluestein; the 128 bound was lifted to 256 after the toolchain
    update cleared the compile-hang class — probe_r70/r71); pow2 raises
    too (it has its own pinned kernels)."""
    import jax.numpy as jnp

    r = jnp.zeros((4, 4093), jnp.float32)  # prime
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_rows_gen_core(r, r, -1, interpret=True)
    r = jnp.zeros((4, 1031), jnp.float32)  # prime > 256
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_rows_gen_core(r, r, -1, interpret=True)
    r = jnp.zeros((4, 1538), jnp.float32)  # 2*769: factor > 256
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_rows_gen_core(r, r, -1, interpret=True)
    r = jnp.zeros((4, 4096), jnp.float32)  # pow2: pinned kernels
    with pytest.raises(pallas_fft.Unsupported):
        pallas_fft._fft_rows_gen_core(r, r, -1, interpret=True)
    # 4097 = 17*241 is now INSIDE the envelope (round 5)
    r = jnp.zeros((4, 4097), jnp.float32)
    rr, ii = pallas_fft._fft_rows_gen_core(r, r, -1, interpret=True)
    assert rr.shape == (4, 4097)


@pytest.mark.parametrize("n,m", [(1000, 256)])
def test_ax0_composite(n, m, rng, assert_close):
    """Axis(-2) kernel on composite non-pow2 n (sublane-domain: no
    alignment constraints on the transform extent)."""
    import jax.numpy as jnp

    x = crand(rng, 2, n, m)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_axis0_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=-2), what=f"ax0 n={n}")


def test_ax3_composite(rng, assert_close):
    import jax.numpy as jnp

    x = crand(rng, 1000, 8, 128)
    re, im = jnp.asarray(x.real), jnp.asarray(x.imag)
    rr, ii = pallas_fft.fft_axis3_split(re, im, -1, interpret=True)
    got = np.asarray(rr) + 1j * np.asarray(ii)
    assert_close(got, np.fft.fft(x, axis=-3), what="ax3 n=1000")


@pytest.mark.parametrize("n", [1000, 4095, 1005])
def test_r2c_general_composite(n, rng, assert_close):
    """General-n single-pass R2C (round 4): even AND odd composite n
    (the XLA pack fallback is even-only)."""
    import jax.numpy as jnp

    x = rng.standard_normal((5, n)).astype(np.float32)
    R, I = pallas_fft.rfft_rows_general_split(jnp.asarray(x),
                                              interpret=True)
    got = np.asarray(R) + 1j * np.asarray(I)
    assert_close(got, np.fft.rfft(x, axis=-1), what=f"r2c gen n={n}")


def test_r2c_general_padded_form(rng):
    import jax.numpy as jnp

    x = rng.standard_normal((3, 1000)).astype(np.float32)
    R, I = pallas_fft.rfft_rows_general_split(jnp.asarray(x),
                                              interpret=True,
                                              pad_out=True)
    mp = 501
    assert R.shape[-1] == 512
    assert float(jnp.max(jnp.abs(R[:, mp:]))) == 0.0
    assert float(jnp.max(jnp.abs(I[:, mp:]))) == 0.0
