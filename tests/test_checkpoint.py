"""Checkpoint/resume for ML training state (SURVEY.md §5): orbax-backed
save/restore must roundtrip exactly, preserve GSPMD shardings, and make a
resumed run indistinguishable from an uninterrupted one.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pyitd_tpu.ml.checkpoint import restore_state, save_state
from pyitd_tpu.ml.moe import ModCRTMoE
from pyitd_tpu.parallel.train import (
    MOE_EP_RULES,
    make_tp_mesh,
    make_train_step,
    param_specs,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


def _setup():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    model = ModCRTMoE(num_experts=8, seed=3, dispatch="capacity", capacity=64)
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params, x


def test_roundtrip_preserves_values_and_sharding(tmp_path):
    _, params, _ = _setup()
    mesh = make_tp_mesh(8, model=4)
    p_sh = shard_params(params, mesh, MOE_EP_RULES)
    tx = optax.adam(1e-3)
    state = {"params": p_sh, "opt": jax.jit(tx.init)(p_sh), "step": jnp.int32(7)}

    path = os.path.join(tmp_path, "ckpt")
    save_state(path, state)
    back = restore_state(path, state)

    assert back["params"]["params"]["W1"].sharding.spec == P("model", None, None)
    assert int(back["step"]) == 7
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        back,
        state,
    )


def test_resume_matches_uninterrupted(tmp_path):
    model, params, x = _setup()
    tgt = 0.5 * x
    mesh = make_tp_mesh(8, model=4)
    specs = param_specs(params, MOE_EP_RULES)
    tx = optax.adam(1e-2)

    def loss_fn(p, batch):
        return jnp.mean((model.apply(p, batch[0]) - batch[1]) ** 2)

    step = make_train_step(loss_fn, tx, mesh, specs)
    batch = shard_batch((x, tgt), mesh)

    p = shard_params(params, mesh, MOE_EP_RULES)
    s = jax.jit(tx.init)(p)
    for _ in range(2):
        p, s, _ = step(p, s, batch)

    path = os.path.join(tmp_path, "mid")
    save_state(path, {"params": p, "opt": s})

    # uninterrupted branch
    p_a, s_a = p, s
    for _ in range(3):
        p_a, s_a, loss_a = step(p_a, s_a, batch)

    # resumed branch from disk
    back = restore_state(path, {"params": p, "opt": s})
    p_b, s_b = back["params"], back["opt"]
    for _ in range(3):
        p_b, s_b, loss_b = step(p_b, s_b, batch)

    assert float(loss_a) == float(loss_b)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        p_a,
        p_b,
    )
