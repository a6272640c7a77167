"""UltraMemv5 — shared-memory-bank layers (``/root/reference/RMLP.py:379-737``).

A product-key memory variant: per layer, row/col queries preselect top-k
key rows/columns from shared banks (single flattened matmuls with learned
rank mixers folded in), a Tucker-style grid score picks ``top_m`` (row,
col) cells, and a *factored codebook* (row/col embeddings through bilinear
heads, top-k sparsified) produces value and pre-value codes that accumulate
into a shared basis; a per-layer near-identity projector finishes.

Faithful to the reference's effective computation, including: preselect on
stop-gradient key banks (the reference caches them under no_grad), the
core-mixed ``qrow`` grid score (the reference computes an unmixed ``A_sel``
then overwrites it), L2-bounded accumulation, and parallel-residual blocks
(x + ffn(norm(x)) + mem(norm(x))).
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["UltraMemCfg", "UltraMemClassifier"]


@dataclass(frozen=True)
class UltraMemCfg:
    hidden_size: int = 64
    n_keys: int = 64
    key_dim: int = 16
    tucker_rank: int = 2
    rb: int = 32            # value code dim
    rp: int = 32            # pre-value code dim
    qr: int = 32            # row embedding dim
    qc: int = 32            # col embedding dim
    ks_s: int = 4           # top-k sparsity for S rows
    ks_t: int = 4           # top-k sparsity for T rows
    projector_rank: int = 8
    topk_rows: int = 8
    topk_cols: int = 8
    top_m: int = 8
    softmax_tau: float = 1.0
    n_blocks: int = 2
    ffn_multiple: float = 2.0
    num_classes: int = 64


def _rmsnorm(x, w, eps=1e-6):
    return x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + eps) * w


def _topk_row_sparsify(mat, k):
    if k <= 0 or k >= mat.shape[-1]:
        return mat
    vals, _ = jax.lax.top_k(jnp.abs(mat), k)
    thresh = jax.lax.stop_gradient(vals[..., -1:])
    return jnp.where(jnp.abs(mat) >= thresh, mat, jnp.zeros_like(mat))


class _Shared(nn.Module):
    cfg: UltraMemCfg

    def setup(self):
        c = self.cfg
        h, n, dk, r = c.hidden_size, c.n_keys, c.key_dim, c.tucker_rank
        key_init = lambda scale: (lambda k, s: jax.random.normal(k, s) * scale)
        self.k_row = self.param("K_row", key_init(1 / math.sqrt(dk)), (r, n, dk))
        self.k_col = self.param("K_col", key_init(1 / math.sqrt(dk)), (r, n, dk))
        self.core = self.param("core", key_init(1 / math.sqrt(max(1, r))), (r, r))
        self.row_mix = self.param("row_mix", nn.initializers.normal(1.0), (r,))
        self.col_mix = self.param("col_mix", nn.initializers.normal(1.0), (r,))
        self.row_emb = self.param("row_emb", nn.initializers.normal(0.01), (n, c.qr))
        self.col_emb = self.param("col_emb", nn.initializers.normal(0.01), (n, c.qc))
        w02 = nn.initializers.normal(0.02)
        self.row_to_s = self.param("row_to_S", w02, (c.qr, c.rb))
        self.col_to_s = self.param("col_to_S", w02, (c.qc, c.rb))
        self.row_to_t = self.param("row_to_T", w02, (c.qr, c.rp))
        self.col_to_t = self.param("col_to_T", w02, (c.qc, c.rp))

        def b_init(k, s):
            b = jax.random.normal(k, s) / math.sqrt(h)
            d = min(s[0], s[1])
            return b.at[:d, :d].add(jnp.eye(d))

        self.basis_b = self.param("B", b_init, (c.rb, h))
        self.x_to_u = self.param("x_to_U", nn.initializers.lecun_normal(), (h, c.rp))

    def __call__(self):  # params-only module
        return None


class _MemLayer(nn.Module):
    cfg: UltraMemCfg
    shared: _Shared

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        s = self.shared
        h, n, dk, r = c.hidden_size, c.n_keys, c.key_dim, c.tucker_rank
        bsz = x.shape[0]

        q_all = nn.Dense(2 * r * dk, use_bias=False, name="q")(x).reshape(bsz, 2, r, dk)
        qrow, qcol = q_all[:, 0], q_all[:, 1]

        # preselect on stop-gradient flattened banks with folded mixers
        krf = jax.lax.stop_gradient(
            jnp.moveaxis(s.k_row, 1, 0).reshape(n, r * dk).T
        )  # (r*dk, n)
        kcf = jax.lax.stop_gradient(
            jnp.moveaxis(s.k_col, 1, 0).reshape(n, r * dk).T
        )
        sr = jnp.repeat(s.row_mix, dk)[:, None]
        sc = jnp.repeat(s.col_mix, dk)[:, None]
        row_score = qrow.reshape(bsz, -1) @ (krf * sr)
        col_score = qcol.reshape(bsz, -1) @ (kcf * sc)
        _, row_idx = jax.lax.top_k(row_score, c.topk_rows)
        _, col_idx = jax.lax.top_k(col_score, c.topk_cols)

        # gather selected keys: (B, r, P, dk)
        k_row_sel = jnp.moveaxis(s.k_row[:, row_idx], 1, 0)  # (B, r, Pr, dk)
        k_col_sel = jnp.moveaxis(s.k_col[:, col_idx], 1, 0)

        qrow_mixed = jnp.einsum("ij,brk->bjk", s.core.T, qrow)
        # RMLP.py:570 'brpk,bjk->bjp': the key bank's rank axis is SUMMED
        # independently of the mixed-q rank axis j (a full r x j mixing),
        # not a per-rank diagonal contraction
        a_sel = jnp.einsum("brpk,bjk->bjp", k_row_sel, qrow_mixed)
        b_sel = jnp.einsum("brqk,brk->brq", k_col_sel, qcol)
        grid = jnp.einsum("brp,brn->bpn", a_sel, b_sel)  # (B, Pr, Pc)

        flat = grid.reshape(bsz, -1)
        top_scores, top_idx = jax.lax.top_k(flat, c.top_m)
        row_pick = top_idx // c.topk_cols
        col_pick = top_idx % c.topk_cols
        picked_rows = jnp.take_along_axis(row_idx, row_pick, axis=1)
        picked_cols = jnp.take_along_axis(col_idx, col_pick, axis=1)

        if c.softmax_tau != 0:
            weights = jax.nn.softmax(top_scores / c.softmax_tau, axis=1)
        else:
            weights = top_scores

        row_vecs = s.row_emb[picked_rows]  # (B, M, Qr)
        col_vecs = s.col_emb[picked_cols]
        s_rows = row_vecs @ s.row_to_s + col_vecs @ s.col_to_s  # (B, M, Rb)
        t_rows = row_vecs @ s.row_to_t + col_vecs @ s.col_to_t  # (B, M, Rp)
        s_rows = _topk_row_sparsify(s_rows, c.ks_s)
        t_rows = _topk_row_sparsify(t_rows, c.ks_t)

        u = x @ s.x_to_u  # (B, Rp)
        pv = jnp.einsum("bmr,br->bm", t_rows, u)
        a = weights * pv
        s_acc = jnp.sum(a[..., None] * s_rows, axis=1)
        s_acc = s_acc / (jnp.linalg.norm(s_acc, axis=-1, keepdims=True) + 1e-12)
        g = s_acc @ s.basis_b  # (B, H)

        pr = c.projector_rank
        low = nn.Dense(h, use_bias=False, name="Uproj")(
            nn.Dense(pr, use_bias=False, name="Vproj")(g)
        )
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return g + jnp.tanh(gamma) * low


class _FFN(nn.Module):
    cfg: UltraMemCfg

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        inner = int(c.hidden_size * c.ffn_multiple)
        w1 = nn.Dense(inner, use_bias=False)(x)
        w2 = nn.Dense(inner, use_bias=False)(x)
        return nn.Dense(c.hidden_size, use_bias=False)(jax.nn.silu(w1) * w2)


class UltraMemClassifier(nn.Module):
    """Stack of parallel-residual UltraMem blocks + head (RMLP.py:623-737)."""

    cfg: UltraMemCfg
    input_dim: int | None = None

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        if self.input_dim is not None and self.input_dim != c.hidden_size:
            x = nn.Dense(c.hidden_size, use_bias=False, name="input_proj")(x)
        shared = _Shared(c, name="shared")
        shared()  # materialize shared params
        for i in range(c.n_blocks):
            wn1 = self.param(f"norm_ffn_{i}", nn.initializers.ones, (c.hidden_size,))
            wn2 = self.param(f"norm_mem_{i}", nn.initializers.ones, (c.hidden_size,))
            ffn_out = _FFN(c, name=f"ffn_{i}")(_rmsnorm(x, wn1))
            mem_out = _MemLayer(c, shared, name=f"mem_{i}")(_rmsnorm(x, wn2))
            x = x + ffn_out + mem_out
        wn = self.param("final_norm", nn.initializers.ones, (c.hidden_size,))
        return nn.Dense(c.num_classes, name="head")(_rmsnorm(x, wn))
