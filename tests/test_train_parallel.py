"""Model-parallel training: tensor-parallel ParsevalGPT steps and
expert-parallel ModCRTMoE on the virtual 8-device mesh.

The reference has no distributed ML (SURVEY.md §2.5); these tests pin the
TPU-native capability: rule-derived GSPMD shardings must (a) actually
land on the requested mesh axes, (b) leave the math identical to the
single-device run, and (c) stay stable across optimizer steps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import PartitionSpec as P

from pyitd_tpu.ml.moe import ModCRTMoE, capacity_dispatch
from pyitd_tpu.ml.parseval import GPTConfig, ParsevalGPT
from pyitd_tpu.parallel.train import (
    MOE_EP_RULES,
    PARSEVAL_TP_RULES,
    make_tp_mesh,
    make_train_step,
    param_specs,
    shard_batch,
    shard_params,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the virtual 8-device mesh"
)


def _tiny_gpt():
    cfg = GPTConfig(
        block_size=16,
        vocab_size=32,
        n_layer=1,
        n_embd=32,
        wavelet_levels=2,
        near_window=4,
        ancilla_dim=8,
        n_anchor=8,
    )
    model = ParsevalGPT(cfg)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, cfg.block_size)))
    yb = jnp.asarray(rng.integers(0, cfg.vocab_size, size=(4, cfg.block_size)))
    params = model.init(jax.random.PRNGKey(0), xb, yb)
    return model, params, xb, yb


def test_capacity_dispatch_tensor():
    eid = jnp.asarray([0, 2, 0, 1, 0, 2], jnp.int32)
    d = capacity_dispatch(eid, 3, 2)
    assert d.shape == (6, 3, 2)
    # token 0 and 2 take expert 0's two slots; token 4 overflows -> dropped
    assert d[0, 0, 0] == 1 and d[2, 0, 1] == 1 and float(d[4].sum()) == 0
    # every kept token occupies exactly one (expert, slot)
    assert float(d.sum()) == 5


def test_moe_capacity_matches_gather():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    gather = ModCRTMoE(num_experts=8, seed=3)
    # capacity = all tokens: nothing can overflow, outputs must agree
    cap = ModCRTMoE(num_experts=8, seed=3, dispatch="capacity", capacity=32)
    params = gather.init(jax.random.PRNGKey(2), x)
    yg = gather.apply(params, x)
    yc = cap.apply(params, x)
    np.testing.assert_allclose(np.asarray(yc), np.asarray(yg), rtol=2e-5, atol=2e-6)


def test_moe_capacity_drops_overflow():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 16)), jnp.float32)
    m0 = ModCRTMoE(num_experts=2, seed=3, dispatch="capacity", capacity=32)
    m1 = ModCRTMoE(num_experts=2, seed=3, dispatch="capacity", capacity=1)
    params = m0.init(jax.random.PRNGKey(2), x)
    y0 = m0.apply(params, x)
    y1 = m1.apply(params, x)
    # overflowed tokens produce exactly zero rows, served tokens are intact
    dropped = np.abs(np.asarray(y1)).sum(-1) == 0
    assert dropped.sum() == 30  # 32 tokens, 2 experts x capacity 1
    np.testing.assert_allclose(
        np.asarray(y1)[~dropped], np.asarray(y0)[~dropped], rtol=2e-5, atol=2e-6
    )


def test_moe_expert_parallel_matches_single_device():
    mesh = make_tp_mesh(8, model=4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, 16)), jnp.float32)
    model = ModCRTMoE(num_experts=8, seed=3, dispatch="capacity", capacity=32)
    params = model.init(jax.random.PRNGKey(2), x)
    y_ref = model.apply(params, x)

    specs = param_specs(params, MOE_EP_RULES)
    assert specs["params"]["W1"] == P("model", None, None)
    p_sh = shard_params(params, mesh, MOE_EP_RULES)
    assert p_sh["params"]["W1"].sharding.spec == P("model", None, None)
    x_sh = shard_batch(x, mesh)
    y = jax.jit(model.apply)(p_sh, x_sh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=2e-5, atol=2e-6)


def test_tp_rules_land_on_mesh():
    mesh = make_tp_mesh(8, model=4)
    _, params, _, _ = _tiny_gpt()
    specs = param_specs(params, PARSEVAL_TP_RULES)
    blk = specs["params"]["block_0"]
    assert blk["mlp"]["Dense_0"]["kernel"] == P(None, "model")
    assert blk["mlp"]["Dense_1"]["kernel"] == P("model", None)
    assert blk["attn"]["w_v"]["kernel"] == P(None, "model")
    assert blk["attn"]["w_o"]["kernel"] == P("model", None)
    assert blk["attn"]["w_q"] == P()  # replicated: QR dual frame
    assert specs["params"]["wte"]["embedding"] == P(None, "model")
    assert specs["params"]["lm_head"]["kernel"] == P(None, "model")
    p_sh = shard_params(params, mesh, PARSEVAL_TP_RULES)
    k = p_sh["params"]["block_0"]["mlp"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    # the kernel really is split 4-ways on its output dim
    assert k.addressable_shards[0].data.shape == (k.shape[0], k.shape[1] // 4)


def test_tp_train_step_matches_single_device():
    model, params, xb, yb = _tiny_gpt()
    tx = optax.sgd(0.05)

    def loss_fn(p, batch):
        return model.apply(p, batch[0], batch[1])[1]

    # single-device baseline
    @jax.jit
    def ref_step(p, s, batch):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        upd, s = tx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    p_ref, s_ref = params, tx.init(params)
    ref_losses = []
    for _ in range(3):
        p_ref, s_ref, loss = ref_step(p_ref, s_ref, (xb, yb))
        ref_losses.append(float(loss))

    # sharded run: dp=2 x tp=4
    mesh = make_tp_mesh(8, model=4)
    specs = param_specs(params, PARSEVAL_TP_RULES)
    p_sh = shard_params(params, mesh, PARSEVAL_TP_RULES)
    s_sh = jax.jit(tx.init)(p_sh)
    step = make_train_step(loss_fn, tx, mesh, specs)
    batch = shard_batch((xb, yb), mesh)
    losses = []
    for _ in range(3):
        p_sh, s_sh, loss = step(p_sh, s_sh, batch)
        losses.append(float(loss))

    np.testing.assert_allclose(losses, ref_losses, rtol=1e-5, atol=1e-6)
    # layout survived the optimizer steps
    k = p_sh["params"]["block_0"]["mlp"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "model")
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        p_sh,
        p_ref,
    )


def test_mixed_precision_step_keeps_master_weights():
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.normal(size=(8, 8, 16)), jnp.float32)
    tgt = 0.5 * x
    model = ModCRTMoE(num_experts=8, seed=3, dispatch="capacity", capacity=80)
    params = model.init(jax.random.PRNGKey(3), x)
    mesh = make_tp_mesh(8, model=4)
    specs = param_specs(params, MOE_EP_RULES)
    tx = optax.adam(1e-2)

    def loss_fn(p, batch):
        return jnp.mean(
            (model.apply(p, batch[0].astype(batch[1].dtype)) - batch[1]) ** 2
        )

    def run(compute_dtype):
        step = make_train_step(loss_fn, tx, mesh, specs,
                               compute_dtype=compute_dtype)
        p = shard_params(params, mesh, MOE_EP_RULES)
        s = jax.jit(tx.init)(p)
        batch = shard_batch((x, tgt), mesh)
        losses = []
        for _ in range(5):
            p, s, loss = step(p, s, batch)
            losses.append(float(loss))
        return p, losses

    p_bf, l_bf = run(jnp.bfloat16)
    _, l_f32 = run(None)
    # master weights keep their own precision; bf16 tracks full precision
    for a, b in zip(jax.tree.leaves(p_bf), jax.tree.leaves(params)):
        assert a.dtype == b.dtype, (a.dtype, b.dtype)
    assert l_bf[-1] < l_bf[0]
    np.testing.assert_allclose(l_bf, l_f32, rtol=0.1, atol=5e-3)
