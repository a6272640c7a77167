import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu.ml.tape import (
    reference_activation,
    RectifiedKAN,
    CachedMultiheadAttention,
    TapeHeadBlock,
    MLayer,
    LieMLayer,
    apply_rope,
)


def test_reference_activation_bounded():
    x = jnp.asarray(np.linspace(-100, 100, 201))
    y = np.asarray(reference_activation(x))
    assert np.all(np.abs(y) <= 1.0 / np.sqrt(24) + 1e-6)
    assert np.all(np.sign(y) == np.sign(np.asarray(x)))


def test_rope_norm_preserving():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 32)))
    y = apply_rope(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(y), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1),
        atol=1e-8,
    )


def test_cached_attention_incremental_matches_full():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    attn = CachedMultiheadAttention(num_heads=2)
    params = attn.init(jax.random.PRNGKey(0), x, x, x)

    # incremental with cache must equal a fresh query over the grown prefix
    cache = None
    for t in range(8):
        tok = x[:, t : t + 1]
        out, cache = attn.apply(params, tok, tok, tok, cache)
        prefix = x[:, : t + 1]
        want, _ = attn.apply(params, tok, prefix, prefix)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)
    assert cache[0].shape[1] == 8


def test_tape_head_block_runs():
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 12, 32)), jnp.float32)
    blk = TapeHeadBlock(seq_len=16, num_heads=2)
    params = blk.init(jax.random.PRNGKey(0), x)
    y, kv = blk.apply(params, x)
    assert y.shape == x.shape and kv[0].shape[1] == 12


def test_mlayer_matches_expm_identity():
    m = MLayer(dim_m=4)
    x = jnp.zeros((3, 5))
    p = m.init(jax.random.PRNGKey(0), x)
    out = np.asarray(m.apply(p, x))
    for i in range(3):
        np.testing.assert_allclose(out[i], np.eye(4), atol=1e-6)  # expm(0) = I
    # approx path close to exact
    rng = np.random.default_rng(3)
    x2 = jnp.asarray(rng.normal(size=(2, 5)) * 0.3, jnp.float32)
    exact = np.asarray(m.apply(p, x2))
    m2 = MLayer(dim_m=4, use_approx=True)
    approx = np.asarray(m2.apply(p, x2))
    np.testing.assert_allclose(approx, exact, atol=1e-3)


def test_lie_mlayer_blocks():
    # the reference uses *independent* angle generators for cos and sin, so
    # the blocks are general [c s; -s c] mixes — orthogonal only when the
    # two generators coincide.  Check both behaviors.
    m = LieMLayer(dim_m=6)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(4, 10)), jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    r = np.asarray(m.apply(p, x))
    assert r.shape == (4, 6, 6) and np.all(np.isfinite(r))

    import flax

    pt = flax.core.unfreeze(p) if hasattr(flax.core, "unfreeze") else dict(p)
    pt["params"]["u2"] = pt["params"]["u"]
    pt["params"]["gen_theta2"] = pt["params"]["gen_theta"]
    r2 = np.asarray(m.apply(pt, x))
    for i in range(4):
        np.testing.assert_allclose(r2[i] @ r2[i].T, np.eye(6), atol=1e-4)


def test_sinusoidal_embedding_odd_dim():
    import math

    from pyitd_tpu.ml.tape import sinusoidal_embedding

    d = 63
    emb = sinusoidal_embedding(16, d)
    assert emb.shape == (16, d)  # crashed with a broadcast error pre-fix
    div = np.exp(np.arange(0, d, 2) * -(math.log(10000.0) / d))
    pos = np.arange(16)[:, None]
    np.testing.assert_allclose(emb[:, 0::2], np.sin(pos * div), atol=0)
    np.testing.assert_allclose(emb[:, 1::2], np.cos(pos * div)[:, : d // 2],
                               atol=0)
