import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu.ml.zoo import RecurrentMLP, fixed_embedding, UnigramModel, BatchSampler


def test_recurrent_mlp():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 12)), jnp.float32)
    m = RecurrentMLP(k=2)
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == x.shape


def test_fixed_embedding_rows():
    w = np.asarray(fixed_embedding(10, 8, seed=1))
    np.testing.assert_allclose(w.mean(1), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(w, axis=1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(w, np.asarray(fixed_embedding(10, 8, seed=1)))


def test_unigram_baseline():
    m = UnigramModel(vocab_size=7)
    idx = jnp.asarray(np.random.default_rng(2).integers(0, 7, (3, 5)))
    p = m.init(jax.random.PRNGKey(0), idx, idx)
    logits, loss = m.apply(p, idx, idx)
    assert logits.shape == (3, 5, 7)
    np.testing.assert_allclose(float(loss), np.log(7), atol=1e-5)  # uniform init


def test_batch_sampler():
    data = np.arange(10_000) % 50
    s = BatchSampler(data, block_size=32, batch_size=4, pad_len=0, seed=0)
    x, y = s.sample()
    assert x.shape == (4, 32) and y.shape == (4, 32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x) + 1 - 50 * (np.asarray(x) == 49))
