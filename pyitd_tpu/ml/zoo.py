"""Notebook model-zoo staples (tiny.ipynb / tiny_trained_full.ipynb).

The idea-test-bed notebooks share a small set of load-bearing pieces:

* :class:`RecurrentMLP` — the namesake model ("beats hard/soft-routed MoE
  on many toy tasks"): k residual GELU cells (tiny.ipynb cell 0);
* :func:`fixed_embedding` — deterministic zero-mean unit-norm token
  embedding table (non-learned);
* :class:`UnigramModel` — the context-free logits baseline used for
  BPC/PPL calibration (tiny.ipynb cell 25);
* :class:`BatchSampler` — the GPUBatchDataset capability: aligned /
  jittered contiguous block sampling from a token stream (host-side,
  numpy-backed, yields device arrays).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["RecurrentMLP", "fixed_embedding", "UnigramModel", "BatchSampler"]


class _Cell(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        he = nn.initializers.he_uniform()
        h = nn.gelu(nn.Dense(self.hidden, use_bias=False, kernel_init=he)(x))
        return nn.Dense(d, use_bias=True, kernel_init=he)(h)


class RecurrentMLP(nn.Module):
    """k residual cells: z <- z + cell_i(z)."""

    k: int = 2
    hidden_mult: int = 2

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        z = x
        for i in range(self.k):
            z = z + _Cell(d * self.hidden_mult, name=f"cell_{i}")(z)
        return z


def fixed_embedding(num_embeddings: int, embedding_dim: int, seed: int = 0) -> jnp.ndarray:
    """Deterministic zero-mean unit-norm embedding rows (non-learned)."""
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(num_embeddings, embedding_dim))
    w = w - w.mean(axis=1, keepdims=True)
    w = w / (np.linalg.norm(w, axis=1, keepdims=True) + 1e-8)
    return jnp.asarray(w, jnp.float32)


class UnigramModel(nn.Module):
    """Context-free learnable logits baseline; returns (logits, loss)."""

    vocab_size: int

    @nn.compact
    def __call__(self, idx, targets=None):
        logits_row = self.param("logits", nn.initializers.zeros, (self.vocab_size,))
        logits = jnp.broadcast_to(logits_row, idx.shape + (self.vocab_size,))
        if targets is None:
            return logits, None
        valid = targets != -1
        onehot = jax.nn.one_hot(jnp.maximum(targets, 0), self.vocab_size)
        nll = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
        return logits, loss


class BatchSampler:
    """Aligned/jittered contiguous block sampler over a 1-D token stream.

    The GPUBatchDataset capability (tiny.ipynb cell 13): each row picks an
    aligned block start, optionally adding a small jitter with probability
    ``1 - p_aligned``; targets are the inputs shifted by ``1 + pad_len``.
    """

    def __init__(self, data, block_size: int, batch_size: int, *, jitter: int = 63,
                 p_aligned: float = 0.5, pad_len: int = 0, seed: int = 0):
        self.data = np.asarray(data)
        self.block_size = block_size
        self.batch_size = batch_size
        self.pad_len = int(pad_len)
        self.sample_len = block_size + self.pad_len
        self.total = len(self.data) - self.sample_len - 1
        self.n_blocks = self.total // self.sample_len
        self.jitter = int(jitter)
        self.p_aligned = float(p_aligned)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.total // self.batch_size

    def sample(self):
        x = np.empty((self.batch_size, self.sample_len), np.int64)
        y = np.empty((self.batch_size, self.block_size), np.int64)
        for i in range(self.batch_size):
            start = self.rng.integers(0, self.n_blocks) * self.sample_len
            if self.rng.random() > self.p_aligned:
                start = min(start + self.rng.integers(0, self.jitter + 1), self.total)
            x[i] = self.data[start : start + self.sample_len]
            y[i] = self.data[start + 1 + self.pad_len : start + 1 + self.pad_len + self.block_size]
        return jnp.asarray(x), jnp.asarray(y)
