"""Tape transformer + matrix-exponential layers (TapeTransformer.ipynb,
m_layer_spiral_pytorch.ipynb).

* :func:`reference_activation` — the rectified-KAN activation
  ``log1p-compress then x/sqrt(1+24x²)``;
* :class:`RectifiedKAN` — expand -> activation -> project MLP;
* :class:`CachedMultiheadAttention` — standard MHA with an explicit KV
  cache threaded through calls (incremental decoding);
* :class:`TapeHeadBlock` — sinusoidal position + RoPE + cached attention +
  RectifiedKAN with pre-norm residuals;
* :class:`MLayer` — maps inputs to a generator combination and matrix-
  exponentiates (exact ``expm`` or scaling-and-squaring approximation);
* :class:`LieMLayer` — the so(2)-block-diagonal fast variant: predict
  rotation angles, exponentiate analytically, conjugate by a learned frame.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "reference_activation",
    "RectifiedKAN",
    "CachedMultiheadAttention",
    "TapeHeadBlock",
    "MLayer",
    "LieMLayer",
    "sinusoidal_embedding",
    "apply_rope",
]


def reference_activation(x, gamma: float = 24.0):
    log_x = jnp.sign(x) * jnp.log1p(jnp.abs(x))
    return log_x / jnp.sqrt(1.0 + gamma * log_x**2)


class RectifiedKAN(nn.Module):
    expansion_factor: int = 8

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.Dense(self.expansion_factor * d)(x)
        return nn.Dense(d, use_bias=False)(reference_activation(h))


def sinusoidal_embedding(seq_len: int, embed_dim: int) -> np.ndarray:
    pos = np.arange(seq_len)[:, None]
    div = np.exp(np.arange(0, embed_dim, 2) * -(math.log(10000.0) / embed_dim))
    out = np.zeros((seq_len, embed_dim))
    out[:, 0::2] = np.sin(pos * div)
    # odd embed_dim: the cos lane has one fewer column than div
    out[:, 1::2] = np.cos(pos * div)[:, : embed_dim // 2]
    return out


def apply_rope(x, offset: int = 0):
    """RoPE on interleaved pairs (B, S, D)."""
    b, s, d = x.shape
    half = d // 2
    freqs = 1.0 / (10000.0 ** (np.arange(half) / half))
    pos = jnp.arange(offset, offset + s, dtype=x.dtype)
    theta = pos[:, None] * jnp.asarray(freqs, x.dtype)[None, :]
    cos, sin = jnp.cos(theta)[None], jnp.sin(theta)[None]
    x1, x2 = x[..., 0::2], x[..., 1::2]
    out = jnp.stack([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.reshape(b, s, d)


class CachedMultiheadAttention(nn.Module):
    num_heads: int

    @nn.compact
    def __call__(self, query, key, value, past_kv=None):
        d = query.shape[-1]
        hd = d // self.num_heads
        wq = nn.Dense(d, name="wq")
        wk = nn.Dense(d, name="wk")
        wv = nn.Dense(d, name="wv")
        wo = nn.Dense(d, name="wo")

        k = wk(key)
        v = wv(value)
        if past_kv is not None:
            k = jnp.concatenate([past_kv[0], k], axis=1)
            v = jnp.concatenate([past_kv[1], v], axis=1)
        q = wq(query)

        def heads(a):
            return a.reshape(a.shape[0], a.shape[1], self.num_heads, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = heads(q), heads(k), heads(v)
        att = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
        att = jax.nn.softmax(att, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh)
        out = out.transpose(0, 2, 1, 3).reshape(q.shape)
        return wo(out), (k, v)


class TapeHeadBlock(nn.Module):
    seq_len: int
    num_heads: int = 1
    use_rope: bool = True

    @nn.compact
    def __call__(self, x, past_kv=None, offset: int = 0):
        d = x.shape[-1]
        pos = jnp.asarray(sinusoidal_embedding(self.seq_len, d), x.dtype)
        s = x.shape[1]
        h = x + pos[None, offset : offset + s]
        if self.use_rope:
            h = apply_rope(h, offset)
        # one tensor for q, k, AND v like the reference's
        # `cached_attn(attn_input, attn_input, attn_input)` — normalizing
        # only the query would compute logits between a normalized and an
        # unnormalized representation and scale them with the stream norm
        hn = nn.LayerNorm(name="ln_attn")(h)
        attn_out, new_kv = CachedMultiheadAttention(self.num_heads, name="attn")(
            hn, hn, hn, past_kv
        )
        x = x + attn_out
        x = x + RectifiedKAN(name="mlp")(nn.LayerNorm(name="ln_mlp")(x))
        return x, new_kv


class MLayer(nn.Module):
    """expm of a learned generator combination."""

    dim_m: int
    with_bias: bool = False
    use_approx: bool = False
    num_squarings: int = 6

    @nn.compact
    def __call__(self, x):
        dim_in = x.shape[-1]
        gen = self.param(
            "generators",
            lambda k, s: jax.random.normal(k, s) * 0.1,
            (dim_in, self.dim_m, self.dim_m),
        )
        m = jnp.einsum("...a,amn->...mn", x, gen)
        if self.with_bias:
            b = self.param(
                "bias", lambda k, s: jax.random.normal(k, s) * 0.1,
                (1, self.dim_m, self.dim_m),
            )
            m = m + b
        if self.use_approx:
            mat = m / (2**self.num_squarings) + jnp.eye(self.dim_m, dtype=x.dtype)
            for _ in range(self.num_squarings):
                mat = mat @ mat
            return mat
        return jax.scipy.linalg.expm(m)


class LieMLayer(nn.Module):
    """so(2)-block rotations in a learned orthogonal frame."""

    dim_m: int
    latent: int = 8

    @nn.compact
    def __call__(self, x):
        assert self.dim_m % 2 == 0
        nb = self.dim_m // 2
        frame = self.param("frame", nn.initializers.orthogonal(), (self.dim_m, self.dim_m))

        xn = x * jax.lax.rsqrt(jnp.mean(x**2, axis=-1, keepdims=True) + 1e-6)
        theta = nn.Dense(nb, name="gen_theta")(nn.Dense(self.latent, name="u")(xn))
        theta2 = nn.Dense(nb, name="gen_theta2")(nn.Dense(self.latent, name="u2")(xn))
        c, s = jnp.cos(theta), jnp.sin(theta2)

        # block-diagonal rotation in the frame basis
        batch = x.shape[:-1]
        r = jnp.zeros(batch + (self.dim_m, self.dim_m), x.dtype)
        idx = jnp.arange(nb)
        r = r.at[..., 2 * idx, 2 * idx].set(c)
        r = r.at[..., 2 * idx + 1, 2 * idx + 1].set(c)
        r = r.at[..., 2 * idx, 2 * idx + 1].set(s)
        r = r.at[..., 2 * idx + 1, 2 * idx].set(-s)
        return frame @ r @ frame.T
