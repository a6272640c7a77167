"""Decomposition-as-features model layers (flax).

The reference's one consumer of ITD inside a model is the ITD-MLP/KAN
hybrid (ITD_Based_MLP_KAN_hybrid.ipynb): ``ITD_Linear`` renders a bank of
multi-scale monotone-cubic smoothings of the input sequence (grid sizes
linspace(2, L/2, out_dim); Fritsch-Butland-style weighted-harmonic slopes;
Hermite basis evaluation) and downstream MLP/RNN heads consume that bank.

TPU design: the per-scale grids, segment ids and Hermite bases depend only
on (L, out_dim) — precomputed as constants; the forward is gathers +
elementwise Hermite blends, vmapped over scales and batch.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ITDLinear", "ITDMLP", "VanillaMLP", "ITDRNNForecaster"]


from functools import lru_cache


@lru_cache(maxsize=None)
def _scale_constants(input_length: int, output_dim: int):
    """Precompute (grid indices, segment ids, hermite basis) per scale.

    Cached by (L, output_dim) — the reference builds these once as
    buffers in __init__; without the cache every eager forward and every
    re-trace pays the O(output_dim * L) host-side numpy work again."""
    positions = np.arange(input_length, dtype=np.float64)
    consts = []
    for grid_size in np.linspace(2, input_length // 2, output_dim):
        g = int(grid_size)
        idx = np.linspace(0, input_length - 1, g).astype(np.int64)
        scale_factor = (g - 1) / (input_length - 1)
        seg = np.clip((positions * scale_factor).astype(np.int64), 0, g - 2)
        x_grid = idx.astype(np.float64)
        start, end = x_grid[seg], x_grid[seg + 1]
        t = (positions - start) / (end - start + 1e-12)
        t2, t3 = t * t, t * t * t
        basis = np.stack(
            [2 * t3 - 3 * t2 + 1, t3 - 2 * t2 + t, -2 * t3 + 3 * t2, t3 - t2]
        )
        consts.append((idx, seg, basis, g))
    return consts


class ITDLinear(nn.Module):
    """Multi-scale monotone-cubic smoothing bank.

    Input (batch, L, 1) -> output (batch, output_dim, L)."""

    input_length: int
    output_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        batch = x.shape[0]
        L = self.input_length
        consts = _scale_constants(L, self.output_dim)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.output_dim, 1))
            if self.use_bias
            else None
        )
        sig = x[..., 0]  # (batch, L)
        outs = []
        for s, (idx, seg, basis, g) in enumerate(consts):
            idx_j = jnp.asarray(idx)
            seg_j = jnp.asarray(seg)
            b = jnp.asarray(basis, x.dtype)
            ext = sig[:, idx_j]  # (batch, g)
            dgrid = (idx_j[1:] - idx_j[:-1]).astype(x.dtype)
            d = (ext[:, 1:] - ext[:, :-1]) / (dgrid + 1e-12)

            m = jnp.zeros((batch, g), x.dtype)
            m = m.at[:, 0].set(d[:, 0]).at[:, 1].set(d[:, 0])
            m = m.at[:, -2].set(d[:, -1]).at[:, -1].set(d[:, -1])
            if g > 3:
                i_range = jnp.arange(2, g - 2)
                d_im2 = d[:, i_range - 2]
                d_im1 = d[:, i_range - 1]
                d_i = d[:, i_range]
                d_ip1 = d[:, i_range + 1]
                w1 = jnp.abs(d_ip1 - d_i)
                w2 = jnp.abs(d_im1 - d_im2)
                denom = w1 + w2 + 1e-12
                interior = jnp.where(
                    denom >= 1e-6,
                    (w1 * d_im1 + w2 * d_i) / (denom + 1e-12),
                    0.5 * (d_im1 + d_i),
                )
                m = m.at[:, i_range].set(interior)

            y0 = ext[:, seg_j]
            y1 = ext[:, seg_j + 1]
            m0 = m[:, seg_j]
            m1 = m[:, seg_j + 1]
            delta = (idx_j[1] - idx_j[0]).astype(x.dtype)
            baseline = b[0] * y0 + b[1] * m0 * delta + b[2] * y1 + b[3] * m1 * delta
            if bias is not None:
                baseline = baseline + bias[s]
            outs.append(baseline)
        return jnp.stack(outs, axis=1)


class VanillaMLP(nn.Module):
    """Whole-signal MLP baseline (the notebook's comparison model)."""

    hidden_dim: int
    output_length: int

    @nn.compact
    def __call__(self, x):
        batch, L, _ = x.shape
        h = nn.Dense(self.hidden_dim)(x.reshape(batch, -1))
        h = nn.gelu(h)
        out = nn.Dense(self.output_length)(h)
        return out.reshape(batch, self.output_length, 1)


class ITDMLP(nn.Module):
    """ITDLinear feature bank -> per-sample MLP head."""

    input_length: int
    hidden_dim: int
    output_length: int

    @nn.compact
    def __call__(self, x):
        feats = ITDLinear(self.input_length, self.hidden_dim)(x)  # (b, h, L)
        feats = jnp.moveaxis(feats, 1, 2)  # (b, L, h)
        h = nn.gelu(nn.Dense(self.hidden_dim)(feats))
        out = nn.Dense(1)(h)  # (b, L, 1)
        if self.output_length != self.input_length:
            out = out[:, : self.output_length]
        return out


class ITDRNNForecaster(nn.Module):
    """ITD feature bank feeding a stack of simple GELU RNN cells
    (notebook cell 7 semantics)."""

    seq_len: int
    hidden_size: int = 64
    num_layers: int = 2
    output_size: int = 1

    @nn.compact
    def __call__(self, x):
        feats = ITDLinear(self.seq_len, self.hidden_size)(x)  # (b, h, L)
        seq = jnp.moveaxis(feats, 1, 2)  # (b, L, h)
        batch = seq.shape[0]

        i2h = [nn.Dense(self.hidden_size) for _ in range(self.num_layers)]
        h2h = [nn.Dense(self.hidden_size) for _ in range(self.num_layers)]
        out_proj = nn.Dense(self.output_size)

        def cell(layer, inp, h_prev):
            return nn.gelu(i2h[layer](inp) + h2h[layer](h_prev))

        hs = [jnp.zeros((batch, self.hidden_size), x.dtype) for _ in range(self.num_layers)]
        outputs = []
        for t in range(self.seq_len):
            inp = seq[:, t]
            for l in range(self.num_layers):
                hs[l] = cell(l, inp, hs[l])
                inp = hs[l]
            outputs.append(out_proj(inp))
        return jnp.stack(outputs, axis=1)
