"""Tiny end-to-end training run — the framework's ML pieces composed.

The reference's de-facto L2 ML tier is a notebook training loop
(tiny.ipynb: GPUBatchDataset sampling, a small model, a UnigramModel
baseline for loss calibration, custom optimizers, and the live dashboard
— SURVEY.md §2.3 C29/C31/C32).  This script is that loop as a runnable
example on synthetic tokens, CPU-friendly (< 2 min):

* ``BatchSampler``    — aligned/jittered block sampling (tiny.ipynb cell 13)
* ``UnigramModel``    — the context-free calibration baseline
* ``fixed_embedding`` + ``RecurrentMLP`` — a tiny LM with learned readout
* ``wolf``            — the Wolf optimizer as an optax transformation
* ``MatrixDashboard`` — per-token correctness frames + EWMA loss bar

Run:  python examples/train_tiny.py   (writes dashboard.png)
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyitd_tpu.ml.zoo import (  # noqa: E402
    BatchSampler, RecurrentMLP, UnigramModel, fixed_embedding)
from pyitd_tpu.ml.optimizers import wolf  # noqa: E402
from pyitd_tpu.ml.visualizer import MatrixDashboard  # noqa: E402

VOCAB = 32
DIM = 48
BLOCK = 64
BATCH = 16
STEPS = 500


def make_stream(n=200_000, seed=0):
    """Structured synthetic tokens: a repeating motif with substitutions —
    learnable next-token structure, so the LM must beat the unigram."""
    rng = np.random.default_rng(seed)
    motif = rng.integers(0, VOCAB, size=17)
    stream = np.tile(motif, n // motif.size + 1)[:n]
    noise = rng.random(n) < 0.15
    stream[noise] = rng.integers(0, VOCAB, size=noise.sum())
    return stream.astype(np.int64)


class TinyLM(nn.Module):
    """Frozen-embedding residual-MLP LM with a 1-step causal mix and a
    learned readout (tiny.ipynb's FixedEmbedding + RecurrentMLP
    shape at demo scale)."""

    vocab: int = VOCAB
    dim: int = DIM

    @nn.compact
    def __call__(self, idx, targets=None):
        emb = fixed_embedding(self.vocab, self.dim)
        h = emb[idx]
        # causal context: mix in the previous token's features
        prev = jnp.pad(h[:, :-1], ((0, 0), (1, 0), (0, 0)))
        h = jnp.concatenate([h, prev], axis=-1)
        h = nn.Dense(self.dim, use_bias=False)(h)
        h = RecurrentMLP(k=2)(h)
        logits = nn.Dense(self.vocab)(h)
        if targets is None:
            return logits, None
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets).mean()
        return logits, loss


def main():
    t0 = time.time()
    stream = make_stream()
    sampler = BatchSampler(stream, BLOCK, BATCH, seed=1)

    model = TinyLM()
    key = jax.random.PRNGKey(0)
    xb, yb = sampler.sample()
    params = model.init(key, jnp.asarray(xb), jnp.asarray(yb))

    tx = wolf(learning_rate=1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            logits, loss = model.apply(p, xb, yb)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, logits

    # unigram calibration baseline (tiny.ipynb convention)
    uni = UnigramModel(VOCAB)
    uparams = uni.init(key, jnp.asarray(xb), jnp.asarray(yb))
    utx = optax.sgd(0.5)
    ustate = utx.init(uparams)

    @jax.jit
    def ustep(p, s, xb, yb):
        loss, grads = jax.value_and_grad(
            lambda q: uni.apply(q, xb, yb)[1])(p)
        upd, s = utx.update(grads, s, p)
        return optax.apply_updates(p, upd), s, loss

    dash = MatrixDashboard(n_cols=BLOCK, n_rows=16, cell=5)
    frame = None
    for i in range(STEPS):
        xb, yb = sampler.sample()
        xb, yb = jnp.asarray(xb), jnp.asarray(yb)
        params, opt_state, loss, logits = step(params, opt_state, xb, yb)
        uparams, ustate, uloss = ustep(uparams, ustate, xb, yb)
        pred = jnp.argmax(logits[0], axis=-1)
        frame = dash.update(np.asarray(pred), np.asarray(yb[0]),
                            float(loss))
        if i % 50 == 0 or i == STEPS - 1:
            bpc = float(loss) / np.log(2)
            ubpc = float(uloss) / np.log(2)
            print(f"step {i:4d}  loss {float(loss):.3f} ({bpc:.2f} bpc)  "
                  f"unigram {float(uloss):.3f} ({ubpc:.2f} bpc)")

    assert float(loss) < float(uloss), "LM should beat the unigram baseline"
    try:
        from PIL import Image

        Image.fromarray(frame).save("dashboard.png")
        print("dashboard frame written to dashboard.png "
              f"({frame.shape[1]}x{frame.shape[0]})")
    except ImportError:
        print(f"dashboard frame rendered in-memory: {frame.shape}")
    print(f"done in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
