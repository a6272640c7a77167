"""Weighted permutation entropy — vectorized pattern histogram.

Behavioral contract (``/root/reference/MEITD.py:51-128`` /
``helperfunctions.py:40-116``): order-m time-delay embedding, argsort
pattern hashing ``sum(sorted_idx * m**arange(m))``, window-variance weights,
Shannon entropy of the weight-normalized pattern distribution, optional
``/log2(m!)`` normalization.

TPU design: no dicts, no uniques.  Each window's permutation id is computed
from pairwise comparisons (rank of each element = count of elements that
sort before it, ties broken by position exactly like a stable argsort);
pattern weights are accumulated as one masked reduction per hash bin over
the m! (encoded as m**m) hash space — memory peaks at the (windows,)
inputs regardless of batch width (a one-hot (windows × patterns) matmul
materialized 80 GB at ensemble-MEITD widths).

Tie-break note: numpy's quicksort argsort is *unstable*, so on windows with
exactly-equal samples the reference's hash is platform-dependent; this
implementation is deterministically stable (first-occurrence order), which
coincides with the reference on ties-free data (measure-1 for real
signals).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["weighted_permutation_entropy"]


def weighted_permutation_entropy(
    x: jax.Array, order: int = 3, delay: int = 1, *, normalize: bool = False
) -> jax.Array:
    """WPE of the last axis; leading axes broadcast.  Returns scalar per
    batch element."""
    n = x.shape[-1]
    w = n - (order - 1) * delay  # number of windows
    if w < 1:
        raise ValueError("signal too short for the requested order/delay")

    # windows[..., w, order] via strided slicing (static shapes)
    cols = [x[..., i * delay : i * delay + w] for i in range(order)]
    emb = jnp.stack(cols, axis=-1)

    # rank with stable tie-break: rank_i = #{j: v_j < v_i} + #{j<i: v_j == v_i}
    vi = emb[..., :, None]
    vj = emb[..., None, :]
    less = (vj < vi).sum(axis=-1)
    pos_i = lax.broadcasted_iota(jnp.int32, emb.shape, emb.ndim - 1)[..., :, None]
    pos_j = lax.broadcasted_iota(jnp.int32, emb.shape, emb.ndim - 1)[..., None, :]
    eq_before = ((vj == vi) & (pos_j < pos_i)).sum(axis=-1)
    rank = (less + eq_before).astype(jnp.int32)  # (..., w, order)

    # reference hash: argsort indices dotted with order**arange(order).
    # argsort is the inverse permutation of rank: argsort[r] = position of
    # the element with rank r, so hash = sum(pos * order**rank).
    weights_pow = order ** rank.astype(jnp.int32)
    pos = lax.broadcasted_iota(jnp.int32, rank.shape, rank.ndim - 1)
    hashval = jnp.sum(pos * weights_pow, axis=-1)  # (..., w)

    # window variance weights (reference: np.var of each window, ddof=0)
    mean = jnp.mean(emb, axis=-1, keepdims=True)
    var = jnp.mean((emb - mean) ** 2, axis=-1)  # (..., w)

    # histogram over the order**order hash space (only m! codes hit) as
    # nbins masked reductions.  The earlier one-hot matmul materialized a
    # (..., w, nbins) intermediate — 80 GB for the ensemble-MEITD shape
    # (32 realizations x 89 rows x 32k windows x 27 bins) — while this
    # form peaks at the (..., w) inputs and is deterministic for every
    # batch shape (one reduction semantics for the gate everywhere).
    nbins = order**order
    counts0 = jnp.zeros(var.shape[:-1] + (nbins,), x.dtype)

    def bin_body(b, acc):
        c = jnp.sum(jnp.where(hashval == b, var, jnp.zeros_like(var)),
                    axis=-1)
        return lax.dynamic_update_index_in_dim(acc, c, b, acc.ndim - 1)

    counts = lax.fori_loop(0, nbins, bin_body, counts0)

    total = jnp.sum(counts, axis=-1, keepdims=True)
    p = counts / jnp.where(total == 0, jnp.ones_like(total), total)
    ent = -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0), axis=-1)
    if normalize:
        ent = ent / math.log2(math.factorial(order))
    return ent
