import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu.ml.newgpt import WedgeTransform, convex_softmax, AlpertQueryGenerator


def test_convex_softmax_equals_softmax():
    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.normal(size=(3, 7)) * 10)
    np.testing.assert_allclose(
        np.asarray(convex_softmax(s)), np.asarray(jax.nn.softmax(s)), atol=1e-6
    )


def test_wedge_transform_antisymmetric_flow():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 2, 5, 8)), jnp.float32)
    m = WedgeTransform(heads=2)
    p = m.init(jax.random.PRNGKey(0), x)
    # zero-init A -> identity at init
    np.testing.assert_allclose(np.asarray(m.apply(p, x)), np.asarray(x), atol=1e-7)
    # with random A, the flow direction is orthogonal-ish: <x, xS> = 0 per
    # sample since S is antisymmetric
    p2 = jax.tree.map(lambda a: jax.random.normal(jax.random.PRNGKey(1), a.shape), p)
    y = m.apply(p2, x)
    flow = np.asarray(y) - np.asarray(x)
    dots = np.sum(np.asarray(x) * flow, axis=-1)
    np.testing.assert_allclose(dots, 0.0, atol=1e-4)


def test_alpert_queries_orthogonal_basis():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 6, 32)), jnp.float32)
    m = AlpertQueryGenerator(num_heads=4, head_dim=8)
    p = m.init(jax.random.PRNGKey(0), x)
    q = m.apply(p, x)
    assert q.shape == (2, 4, 6, 8)


@pytest.mark.slow
def test_explorer_engineer_stage():
    from pyitd_tpu.ml.newgpt import ExplorerEngineerStage

    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 8, 16)), jnp.float32)
    m = ExplorerEngineerStage(num_heads=2)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))
    # causality of the attention path
    x2 = x.at[:, 5:].set(0.0)
    y2 = m.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y[:, :3]), np.asarray(y2[:, :3]), atol=1e-5)
