"""GPipe microbatch pipeline: forward/grad parity vs the sequential fold
on the virtual 8-device mesh.

The pipeline's contract is purely semantic — ``gpipe_apply(params, x)[m]``
must equal applying the stages in order to microbatch ``m`` — so every
test pins it against the plain Python fold, gradients included, on both a
pp-only mesh and a composed (data, pp) mesh.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh

from pyitd_tpu.ml.moe import BiMLP
from pyitd_tpu.parallel.pipeline import gpipe_apply, stack_stage_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)

PP = 4
M = 6  # microbatches
D = 16


def _mesh(data: int, pp: int) -> Mesh:
    devs = np.asarray(jax.devices()[: data * pp]).reshape(data, pp)
    return Mesh(devs, ("data", "pp"))


def _stages(key):
    block = BiMLP()
    x0 = jnp.zeros((2, D))
    params = [
        block.init(k, x0) for k in jax.random.split(key, PP)
    ]
    return block, stack_stage_params(params)


def _sequential(block, stacked, x):
    def per_stage(i, h):
        p = jax.tree.map(lambda a: a[i], stacked)
        return block.apply(p, h)

    out = x
    for i in range(PP):
        out = per_stage(i, out)
    return out


def test_pipeline_forward_matches_sequential():
    block, stacked = _stages(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(M, 4, D)), jnp.float64
    )
    mesh = _mesh(2, PP)
    f = gpipe_apply(lambda p, h: block.apply(p, h), mesh, M)
    y = f(stacked, x)
    y_ref = _sequential(block, stacked, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-6)


def test_pipeline_pp_only_mesh_and_pp1():
    block, stacked = _stages(jax.random.PRNGKey(2))
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(M, 2, D)), jnp.float64
    )
    y_ref = _sequential(block, stacked, x)

    devs = np.asarray(jax.devices()[:PP]).reshape(PP)
    f = gpipe_apply(
        lambda p, h: block.apply(p, h), Mesh(devs, ("pp",)), M
    )
    np.testing.assert_allclose(
        np.asarray(f(stacked, x)), np.asarray(y_ref), rtol=2e-5, atol=2e-6
    )

    # pp=1 degenerate mesh: one stage, no hops — params (1, ...)
    one = jax.tree.map(lambda a: a[:1], stacked)
    f1 = gpipe_apply(
        lambda p, h: block.apply(p, h),
        Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("pp",)),
        M,
    )
    first = block.apply(jax.tree.map(lambda a: a[0], stacked), x)
    np.testing.assert_allclose(
        np.asarray(f1(one, x)), np.asarray(first), rtol=2e-5, atol=2e-6
    )


def test_pipeline_grads_match_sequential():
    block, stacked = _stages(jax.random.PRNGKey(4))
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(M, 2, D)), jnp.float64
    )
    tgt = jnp.asarray(
        np.random.default_rng(6).normal(size=(M, 2, D)), jnp.float64
    )
    mesh = _mesh(2, PP)
    f = gpipe_apply(lambda p, h: block.apply(p, h), mesh, M)

    def loss_pipe(p):
        return jnp.mean((f(p, x) - tgt) ** 2)

    def loss_seq(p):
        return jnp.mean((_sequential(block, stacked=p, x=x) - tgt) ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=3e-4, atol=1e-6
        ),
        g_pipe,
        g_seq,
    )


def test_pipeline_train_step_learns():
    block, stacked = _stages(jax.random.PRNGKey(7))
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(M, 2, D)), jnp.float64
    )
    tgt = 0.5 * x
    mesh = _mesh(2, PP)
    f = gpipe_apply(lambda p, h: block.apply(p, h), mesh, M)
    tx = optax.adam(1e-2)

    @jax.jit
    def step(p, s):
        loss, g = jax.value_and_grad(
            lambda q: jnp.mean((f(q, x) - tgt) ** 2)
        )(p)
        upd, s = tx.update(g, s, p)
        return optax.apply_updates(p, upd), s, loss

    s = tx.init(stacked)
    p = stacked
    losses = []
    for _ in range(10):
        p, s, loss = step(p, s)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_pipeline_mixed_precision():
    """compute_dtype=bfloat16 runs the pipelined forward/backward in bf16
    (activations and stage params cast inside the pipelined function)
    while the caller's master params and grads keep f32; values track the
    f32 pipeline within bf16 tolerance."""
    block, stacked = _stages(jax.random.PRNGKey(2))
    stacked = jax.tree.map(lambda a: a.astype(jnp.float32), stacked)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(M, 4, D)), jnp.float32
    )
    mesh = _mesh(2, PP)
    f32 = gpipe_apply(lambda p, h: block.apply(p, h), mesh, M)
    fbf = gpipe_apply(lambda p, h: block.apply(p, h), mesh, M,
                      compute_dtype=jnp.bfloat16)
    y32, ybf = f32(stacked, x), fbf(stacked, x)
    assert ybf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(ybf, np.float32), np.asarray(y32), rtol=0.1, atol=0.05)

    loss = lambda p: jnp.mean(fbf(p, x).astype(jnp.float32) ** 2)
    g = jax.jit(jax.grad(loss))(stacked)
    for a, b in zip(jax.tree.leaves(g), jax.tree.leaves(stacked)):
        assert a.dtype == b.dtype  # grads in master precision
        assert bool(jnp.isfinite(a).all())
