"""Parseval / Haar-wavelet attention GPT (flax port of the research
transformer in ``/root/reference/T.py``).

Components and their contracts:

* :func:`variance_scaled_softmax` — per-row standardization over the valid
  (unmasked) entries before softmax; fully-masked rows yield zeros
  (``T.py:32-50``);
* :class:`ParsevalRotaryEmbedding` — rotary pairs over dim/2 split halves
  (``T.py:62-110``);
* :func:`build_haar_wavelet_basis` — blockwise Haar detail vectors over
  ``levels`` dyadic scales (``T.py:113-134``);
* :class:`SingleHeadWaveletAttention` — W_K derived each step as the
  QR-based dual frame of W_Q so ``W_Q W_K^H = I`` (``T.py:173-183``),
  near-field exact attention inside a +-``near_window`` band, far field
  computed in the compressed Haar domain and expanded, merged by the band
  mask, causal-masked, variance-scaled softmax (``T.py:185-259``);
* :class:`UnitaryAncillaAttention` — adds learned always-visible ancilla
  tokens to K/V so no row is ever fully masked (``T.py:261-346``);
* :class:`AnchorModule` — soft-assignment to learned anchors, residual +
  0.1-outward-normal push (``T.py:372-403``);
* :class:`ParsevalGPT` — embedding -> anchored blocks -> tied-free head
  with ``30*tanh(logits/30)`` softcapping (``T.py:449-520``).

The Haar basis, band masks, and rotary tables are static (precomputed
numpy); the per-step QR runs on device.
"""
from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "variance_scaled_softmax",
    "build_haar_wavelet_basis",
    "ParsevalRotaryEmbedding",
    "SingleHeadWaveletAttention",
    "UnitaryAncillaAttention",
    "AnchorModule",
    "GPTConfig",
    "ParsevalGPT",
    "softcap",
]


def variance_scaled_softmax(scores: jax.Array, axis: int = -1, eps: float = 1e-6) -> jax.Array:
    finite = jnp.isfinite(scores)
    m = finite.astype(scores.dtype)
    n = jnp.maximum(jnp.sum(m, axis=axis, keepdims=True), 1.0)
    safe = jnp.where(finite, scores, 0.0)
    mean = jnp.sum(safe * m, axis=axis, keepdims=True) / n
    var = jnp.sum((safe - mean) ** 2 * m, axis=axis, keepdims=True) / n
    std = jnp.sqrt(jnp.maximum(var, eps))
    scaled = jnp.where(finite, (safe - mean) / std, -jnp.inf)
    out = jax.nn.softmax(scaled, axis=axis)
    all_masked = jnp.sum(m, axis=axis, keepdims=True) == 0
    return jnp.where(all_masked, 0.0, out)


def softcap(logits: jax.Array, cap: float = 30.0) -> jax.Array:
    return cap * jnp.tanh(logits / cap)


def build_haar_wavelet_basis(t: int, levels: int) -> np.ndarray:
    cols = []
    for j in range(levels):
        block_count = 2**j
        block_size = t // block_count
        if block_size == 0:
            continue
        half = block_size // 2
        for k in range(block_count):
            vec = np.zeros(t)
            start = k * block_size
            if half > 0:
                vec[start : start + half] = 1.0 / math.sqrt(half)
                vec[start + half : start + block_size] = -1.0 / math.sqrt(half)
            cols.append(vec)
    if not cols:
        return np.eye(t)
    return np.stack(cols, axis=1)


class ParsevalRotaryEmbedding:
    """Static rotary tables; call with (B, T, D) and a position vector."""

    def __init__(self, dim: int, max_seq_len: int = 2048, theta_base: float = 10000.0):
        half = dim // 2
        inv_freq = 1.0 / (theta_base ** (np.arange(half) / half))
        angles = np.arange(max_seq_len)[:, None] * inv_freq[None, :]
        self.cos = jnp.asarray(np.cos(angles))
        self.sin = jnp.asarray(np.sin(angles))

    def __call__(self, x: jax.Array, seq_pos: jax.Array) -> jax.Array:
        half = x.shape[-1] // 2
        c = self.cos[seq_pos][None].astype(x.dtype)
        s = self.sin[seq_pos][None].astype(x.dtype)
        x1, x2 = x[..., :half], x[..., half:]
        return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


def _l2n(x, eps=1e-8):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def _dual_wk(wq: jax.Array) -> jax.Array:
    """QR-based dual frame: W_K with W_Q @ W_K^H = I (T.py:173-183).

    The factorization always runs in >=f32 (QR/inv are not defined for
    bf16 and would be ill-conditioned there anyway); under bf16 mixed
    precision only the result is cast back."""
    dt = wq.dtype
    wq = wq.astype(jnp.promote_types(dt, jnp.float32))
    qm, rm = jnp.linalg.qr(wq.conj().T)
    return (jnp.linalg.inv(rm) @ qm.conj().T).astype(dt)


@dataclass
class GPTConfig:
    block_size: int = 256
    vocab_size: int = 256
    n_layer: int = 2
    n_embd: int = 64
    dropout: float = 0.0
    bias: bool = True
    wavelet_levels: int = 3
    near_window: int = 64
    ancilla_dim: int = 16
    n_anchor: int = 32


class SingleHeadWaveletAttention(nn.Module):
    config: GPTConfig

    def setup(self):
        c = self.config
        self.w_q = self.param(
            "w_q", nn.initializers.xavier_uniform(), (c.n_embd, c.n_embd)
        )
        self.w_v = nn.Dense(c.n_embd, use_bias=False, name="w_v")
        self.w_o = nn.Dense(c.n_embd, use_bias=False, name="w_o")
        self.haar = jnp.asarray(build_haar_wavelet_basis(c.block_size, c.wavelet_levels))
        self.rope = ParsevalRotaryEmbedding(c.n_embd, c.block_size)

    def _qkv(self, x):
        w_k = _dual_wk(self.w_q)
        q = x @ self.w_q.T
        k = x @ w_k.T
        v = self.w_v(x)
        return q, k, v

    def __call__(self, x):
        c = self.config
        b, t, d = x.shape
        q, k, v = self._qkv(x)
        idx = jnp.arange(t)
        q = _l2n(self.rope(q, idx))
        k = _l2n(self.rope(k, idx))

        near = jnp.abs(idx[None, :] - idx[:, None]) <= c.near_window
        att_near = (q @ jnp.swapaxes(k, -2, -1)) / math.sqrt(d)
        att_near = jnp.where(near[None], att_near, -jnp.inf)

        w_h = self.haar[:t].astype(x.dtype)
        q_far = jnp.einsum("btc,tw->bwc", q, w_h)
        k_far = jnp.einsum("btc,tw->bwc", k, w_h)
        att_far = jnp.einsum("bwc,bvc->bwv", q_far, k_far) / math.sqrt(d)
        att_far = jnp.einsum("tw,bwv,sv->bts", w_h, att_far, w_h)

        att = jnp.where(near[None], att_near, att_far)
        causal = jnp.tril(jnp.ones((t, t), bool))
        att = jnp.where(causal[None], att, -jnp.inf)
        att = variance_scaled_softmax(att)
        return self.w_o(att @ v)


class UnitaryAncillaAttention(SingleHeadWaveletAttention):
    def setup(self):
        super().setup()
        c = self.config
        self.ancilla = self.param(
            "ancilla", nn.initializers.orthogonal(), (1, c.ancilla_dim, c.n_embd)
        )

    def __call__(self, x):
        c = self.config
        b, t, d = x.shape
        q, k, v = self._qkv(x)
        idx = jnp.arange(t)
        anc = jnp.broadcast_to(self.ancilla, (b, c.ancilla_dim, d)).astype(x.dtype)
        q = _l2n(self.rope(q, idx))
        k_sem = self.rope(k, idx)
        k_ext = _l2n(jnp.concatenate([anc, k_sem], axis=1))
        v_ext = jnp.concatenate([anc, v], axis=1)

        scores = (q @ jnp.swapaxes(k_ext, -2, -1)) / math.sqrt(d)
        causal = jnp.tril(jnp.ones((t, t), bool))
        full = jnp.concatenate(
            [jnp.ones((t, c.ancilla_dim), bool), causal], axis=-1
        )
        scores = jnp.where(full[None], scores, -jnp.inf)
        att = variance_scaled_softmax(scores)
        return self.w_o(att @ v_ext)


class AnchorModule(nn.Module):
    n_anchor: int = 4

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        anchors = self.param(
            "anchors",
            lambda key, shape: jax.random.normal(key, shape) / (d**0.5),
            (self.n_anchor, d),
        )
        w = jax.nn.softmax(x @ anchors.T, axis=-1)
        recon = w @ anchors
        resid = x - recon
        normal = resid / (jnp.linalg.norm(resid, axis=-1, keepdims=True) + 1e-12)
        return x + resid + 0.1 * normal


class _MLP(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.config
        scale = math.pi / math.sqrt(3.0)
        h = nn.Dense(4 * c.n_embd, use_bias=c.bias)(x)
        h = h * jax.nn.sigmoid(scale * h)
        h = nn.Dense(c.n_embd, use_bias=c.bias)(h)
        if c.dropout > 0:
            h = nn.Dropout(c.dropout, deterministic=deterministic)(h)
        return h


class _Block(nn.Module):
    config: GPTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.config
        h = nn.LayerNorm(use_bias=c.bias)(x)
        h = AnchorModule(c.n_anchor, name="anchor_pre")(h)
        x = x + UnitaryAncillaAttention(c, name="attn")(h)
        x = AnchorModule(c.n_anchor, name="anchor_post")(x)
        x = x + _MLP(c, name="mlp")(nn.LayerNorm(use_bias=c.bias)(x), deterministic)
        return x


class ParsevalGPT(nn.Module):
    """The T.py research transformer; returns (logits, loss)."""

    config: GPTConfig

    @nn.compact
    def __call__(self, idx, targets=None, deterministic=True):
        c = self.config
        x = nn.Embed(c.vocab_size, c.n_embd, name="wte")(idx)
        for i in range(c.n_layer):
            x = _Block(c, name=f"block_{i}")(x, deterministic)
        x = nn.LayerNorm(use_bias=c.bias, name="ln_f")(x)
        head = nn.Dense(c.vocab_size, use_bias=False, name="lm_head")

        if targets is not None:
            logits = softcap(head(x))
            valid = targets != -1
            onehot = jax.nn.one_hot(jnp.maximum(targets, 0), c.vocab_size)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.sum(onehot * logp, axis=-1)
            loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(
                jnp.sum(valid), 1
            )
            return logits, loss
        logits = softcap(head(x[:, -1:, :]))
        return logits, None
