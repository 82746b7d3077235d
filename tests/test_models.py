"""Spectral model family (FNO) — forward, AD through FFTs, training step."""

import jax
import jax.numpy as jnp
import numpy as np

from fft_wgpu_tpu.models.spectral import (
    fno1d_apply,
    init_fno1d,
    mse_loss,
    train_step,
)


def test_fno_forward_shape():
    params = init_fno1d(jax.random.PRNGKey(0), modes=16, width=8, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 128, 1), jnp.float32)
    y = fno1d_apply(params, x)
    assert y.shape == (4, 128, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_fno_training_reduces_loss():
    params = init_fno1d(jax.random.PRNGKey(0), modes=16, width=16, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 128, 1), jnp.float32)
    # learn identity-ish target: y = x smoothed
    y = x * 0.5
    l0 = float(mse_loss(params, x, y))
    for _ in range(20):
        params, loss = train_step(params, x, y, lr=1e-2)
    l1 = float(loss)
    assert l1 < l0, f"loss did not decrease: {l0} -> {l1}"


def test_graft_entry_contract():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.ndim == 3


def test_graft_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_fno2d_forward_and_grad():
    from fft_wgpu_tpu.models.spectral import fno2d_apply, init_fno2d

    params = init_fno2d(jax.random.PRNGKey(0), modes=(8, 8), width=8, depth=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1), jnp.float32)
    y = fno2d_apply(params, x)
    assert y.shape == (2, 32, 32, 1)
    loss = lambda p: jnp.mean(fno2d_apply(p, x) ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_fno3d_forward_and_grad():
    from fft_wgpu_tpu.models.spectral import fno3d_apply, init_fno3d

    params = init_fno3d(jax.random.PRNGKey(0), modes=(4, 4, 4), width=6,
                        depth=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16, 1),
                          jnp.float32)
    y = fno3d_apply(params, x)
    assert y.shape == (2, 8, 8, 16, 1)
    loss = lambda p: jnp.mean(fno3d_apply(p, x) ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_fno3d_training_reduces_loss():
    import jax.numpy as jnp
    from fft_wgpu_tpu.models.spectral import fno3d_apply, init_fno3d

    params = init_fno3d(jax.random.PRNGKey(0), modes=(4, 4, 4), width=6,
                        depth=1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 8, 1), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 8, 1), jnp.float32)

    def loss_fn(p):
        return jnp.mean((fno3d_apply(p, x) - y) ** 2)

    @jax.jit
    def step(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 5e-3 * b, p, g), l

    losses = []
    for _ in range(5):
        params, l = step(params)
        losses.append(float(l))
    assert losses[-1] < losses[0]
