import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from pyitd_tpu.ml.moe import (
    BiMLP,
    ModCRTMoE,
    FastLearnedCellX3,
    router_topk,
    first_primes,
)


def test_first_primes():
    assert first_primes(4) == [3, 5, 7, 11]


def test_router_topk_forward_and_grad():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(5, 8)))
    topi, w = router_topk(z, 3, 1.0)
    assert topi.shape == (5, 3) and w.shape == (5, 3)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)

    def loss(zz):
        _, ww = router_topk(zz, 3, 1.0)
        return jnp.sum(ww**2)

    g = jax.grad(loss)(z)
    gn = np.asarray(g)
    # gradient flows only into the selected entries
    sel = np.zeros((5, 8), bool)
    for i in range(5):
        sel[i, np.asarray(topi)[i]] = True
    assert np.all(gn[~sel] == 0)
    assert np.any(gn[sel] != 0)


@pytest.mark.slow
def test_bimlp_shapes_and_grad():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16)), jnp.float32)
    m = BiMLP()
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(g))


@pytest.mark.slow
def test_modcrt_moe_routes_and_runs():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(32, 12)), jnp.float32)
    m = ModCRTMoE(num_experts=4)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape
    # 3-D input path
    x3 = x.reshape(4, 8, 12)
    y3 = m.apply(params, x3)
    np.testing.assert_allclose(np.asarray(y3).reshape(32, 12), np.asarray(y), atol=1e-6)
    # deterministic hard routing: same input -> same output
    np.testing.assert_array_equal(np.asarray(m.apply(params, x)), np.asarray(y))


@pytest.mark.slow
def test_fast_learned_cell_trains():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, 8)), jnp.float32)
    target = jnp.asarray(np.tanh(np.asarray(x) @ rng.normal(size=(8, 8))), jnp.float32)
    m = FastLearnedCellX3(hidden=16, d_out=8)
    params = m.init(jax.random.PRNGKey(0), x)

    opt = optax.adam(3e-3)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((m.apply(p, x) - target) ** 2)

    l0 = float(loss_fn(params))
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(120):
        _, g = vg(params)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.6, (l0, l1)
