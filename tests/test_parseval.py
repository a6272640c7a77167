import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from pyitd_tpu.ml.parseval import (
    variance_scaled_softmax,
    build_haar_wavelet_basis,
    ParsevalRotaryEmbedding,
    GPTConfig,
    ParsevalGPT,
    SingleHeadWaveletAttention,
    softcap,
    _dual_wk,
)


def test_variance_scaled_softmax_properties():
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(2, 5, 8)) * 7 + 3
    scores[0, 0, 4:] = -np.inf  # partial mask
    out = np.asarray(variance_scaled_softmax(jnp.asarray(scores)))
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-6)
    assert np.all(out[0, 0, 4:] == 0)
    # fully masked row -> zeros
    scores[1, 1, :] = -np.inf
    out = np.asarray(variance_scaled_softmax(jnp.asarray(scores)))
    assert np.all(out[1, 1] == 0)


def test_haar_basis_orthogonal_columns():
    # reference normalization gives each detail vector squared norm 2;
    # different scales/blocks are orthogonal
    w = build_haar_wavelet_basis(64, 3)
    g = w.T @ w
    np.testing.assert_allclose(g, 2.0 * np.eye(w.shape[1]), atol=1e-12)
    # zero mean detail vectors
    np.testing.assert_allclose(w.sum(0), 0.0, atol=1e-12)


def test_dual_frame_identity():
    rng = np.random.default_rng(1)
    wq = jnp.asarray(rng.normal(size=(16, 16)) / 4)
    wk = _dual_wk(wq)
    np.testing.assert_allclose(np.asarray(wq @ wk.conj().T), np.eye(16), atol=1e-8)


def test_rotary_preserves_norm():
    rng = np.random.default_rng(2)
    rope = ParsevalRotaryEmbedding(32, 128)
    x = jnp.asarray(rng.normal(size=(2, 16, 32)))
    y = rope(x, jnp.arange(16))
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        atol=1e-8,
    )


def test_softcap_bounds():
    x = jnp.asarray([-1e6, -10.0, 0.0, 10.0, 1e6])
    y = np.asarray(softcap(x))
    assert np.all(np.abs(y) <= 30.0)
    assert abs(y[2]) < 1e-12


def test_wavelet_attention_runs_causally():
    cfg = GPTConfig(block_size=32, n_embd=16, near_window=4, wavelet_levels=2)
    attn = SingleHeadWaveletAttention(cfg)
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 32, 16)), jnp.float32)
    params = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(params, x)
    assert y.shape == x.shape
    # causality: output at position t must not depend on future inputs
    x2 = x.at[:, 20:].set(0.0)
    y2 = attn.apply(params, x2)
    np.testing.assert_allclose(np.asarray(y[:, :5]), np.asarray(y2[:, :5]), atol=1e-5)


@pytest.mark.slow
def test_gpt_trains_on_copy_task():
    cfg = GPTConfig(block_size=16, vocab_size=12, n_layer=1, n_embd=32,
                    near_window=4, wavelet_levels=2, ancilla_dim=4, n_anchor=4)
    model = ParsevalGPT(cfg)
    rng = np.random.default_rng(4)
    seq = rng.integers(0, 12, size=(8, 17))
    idx = jnp.asarray(seq[:, :-1])
    tgt = jnp.asarray(seq[:, :-1])  # predict the input token itself

    params = model.init(jax.random.PRNGKey(0), idx, tgt)
    opt = optax.adam(3e-3)
    state = opt.init(params)

    def loss_fn(p):
        return model.apply(p, idx, tgt)[1]

    l0 = float(loss_fn(params))
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(80):
        _, g = grad_fn(params)
        updates, state = opt.update(g, state, params)
        params = optax.apply_updates(params, updates)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.7, (l0, l1)
    # inference path (no targets)
    logits, loss = model.apply(params, idx)
    assert logits.shape == (8, 1, 12) and loss is None
