import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from pyitd_tpu.ml.optimizers import wolf, phoenix
from pyitd_tpu.ml.activations import rainstar
from pyitd_tpu.ml.layers import ITDLinear, ITDMLP, VanillaMLP


def test_rainstar_matches_formula():
    x = np.linspace(-5, 5, 101)
    sig = 1 / (1 + np.exp(-x))
    soft = x / (1 + np.abs(x))
    want = ((x * sig) ** 2 + soft) * (1 - sig) + (x - soft) * sig
    got = np.asarray(rainstar(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-12)


def _optimize(opt, steps=200):
    params = {"w": jnp.asarray([3.0, -2.0, 1.5])}
    target = jnp.asarray([0.5, 1.0, -0.7])

    def loss(p):
        return jnp.sum((p["w"] - target) ** 2)

    state = opt.init(params)
    for _ in range(steps):
        g = jax.grad(loss)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return float(loss(params))


def test_wolf_converges_on_quadratic():
    final = _optimize(wolf(learning_rate=5e-2))
    assert final < 0.05, final


def test_phoenix_reduces_quadratic():
    final = _optimize(phoenix(learning_rate=5e-2), steps=300)
    assert final < 1.0, final


@pytest.mark.slow
def test_itd_linear_shapes_and_smoothing():
    rng = np.random.default_rng(0)
    L, out_dim = 64, 6
    x = jnp.asarray(rng.normal(size=(2, L, 1)))
    layer = ITDLinear(L, out_dim)
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == (2, out_dim, L)
    # coarsest scale (grid 2) is much smoother than the finest
    v_coarse = float(jnp.var(jnp.diff(y[:, 0])))
    v_fine = float(jnp.var(jnp.diff(y[:, -1])))
    assert v_coarse < v_fine


@pytest.mark.slow
def test_itdmlp_trains():
    rng = np.random.default_rng(1)
    L = 48
    t = np.linspace(0, 2 * np.pi, L)
    y = np.sin(2 * t) + 0.4 * np.sin(20 * t) + 0.05 * rng.normal(size=L)
    x = jnp.asarray(y.reshape(1, L, 1), jnp.float32)

    model = ITDMLP(input_length=L, hidden_dim=16, output_length=L)
    params = model.init(jax.random.PRNGKey(0), x)
    opt = optax.adam(1e-2)
    state = opt.init(params)

    def loss_fn(p):
        return jnp.mean((model.apply(p, x) - x) ** 2)

    l0 = float(loss_fn(params))
    step = jax.jit(
        lambda p, s: (lambda g: optax.apply_updates(p, opt.update(g, s, p)[0]))(
            jax.grad(loss_fn)(p)
        )
    )
    for _ in range(60):
        g = jax.grad(loss_fn)(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.5, (l0, l1)


def test_vanilla_mlp_shapes():
    x = jnp.zeros((3, 32, 1))
    m = VanillaMLP(hidden_dim=8, output_length=32)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (3, 32, 1)
