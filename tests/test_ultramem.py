import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from pyitd_tpu.ml.ultramem import UltraMemCfg, UltraMemClassifier


@pytest.mark.slow
def test_ultramem_forward_and_train():
    cfg = UltraMemCfg(hidden_size=32, n_keys=16, key_dim=8, tucker_rank=2,
                      rb=16, rp=16, qr=8, qc=8, topk_rows=4, topk_cols=4,
                      top_m=4, n_blocks=2, num_classes=5)
    model = UltraMemClassifier(cfg, input_dim=10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 10)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, 32))

    params = model.init(jax.random.PRNGKey(0), x)
    logits = model.apply(params, x)
    assert logits.shape == (32, 5)

    opt = optax.adam(3e-3)
    state = opt.init(params)

    def loss_fn(p):
        lg = model.apply(p, x)
        return optax.softmax_cross_entropy_with_integer_labels(lg, labels).mean()

    l0 = float(loss_fn(params))
    vg = jax.jit(jax.value_and_grad(loss_fn))
    for _ in range(80):
        _, g = vg(params)
        upd, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upd)
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.8, (l0, l1)


@pytest.mark.slow
def test_ultramem_shared_params_across_blocks():
    cfg = UltraMemCfg(hidden_size=16, n_keys=8, key_dim=4, tucker_rank=2,
                      rb=8, rp=8, qr=4, qc=4, topk_rows=2, topk_cols=2,
                      top_m=2, n_blocks=3, num_classes=3)
    model = UltraMemClassifier(cfg)
    x = jnp.zeros((2, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    shared = [n for n in names if "shared" in n]
    # key banks exist exactly once (shared), not per block
    assert sum("K_row" in n for n in names) == 1
    assert len(shared) > 0


def test_grid_score_mixes_ranks_like_reference():
    """RMLP.py:570's 'brpk,bjk->bjp' SUMS the key bank's rank axis
    independently of the mixed-q rank axis (full r x j mixing) — a
    per-rank diagonal 'brpk,brk->brp' diverges for tucker_rank >= 2."""
    rng = np.random.default_rng(0)
    r, p, dk, b = 2, 3, 4, 2
    k_sel = rng.normal(size=(b, r, p, dk))
    qm = rng.normal(size=(b, r, dk))
    want = np.einsum("brpk,bjk->bjp", k_sel, qm)
    diag = np.einsum("brpk,brk->brp", k_sel, qm)
    assert not np.allclose(want, diag)  # the bug was observable
    got = np.asarray(jnp.einsum("brpk,bjk->bjp", jnp.asarray(k_sel),
                                jnp.asarray(qm)))
    np.testing.assert_allclose(got, want, atol=1e-12)
