"""BlockFast language-model family + O(1) incremental inference
(MachineIntelligence.ipynb).

* :func:`circular_student_t` — circular Student-t routing weights over E
  expert bins;
* :class:`MOEMLP` — phase-scalar-routed mixture of GELU MLP experts;
* :class:`BlockFastBlock` — Mixer (spectral phase heads + causal depthwise
  conv) -> PhaseHeads (with routing scalar) -> MOE, parallel residual;
* :class:`BlockFastLM` — embedding -> BlockFast stack -> linear head;
* the ``*_step`` functions + :func:`blockfast_init_state` reproduce the
  notebook's StepState incremental-inference path as *functional JAX
  carries*: ring buffers of normalized head vectors (lag-s anchors), the
  depthwise-conv tail, and the lag-1 scalar state.  After the warm-up
  window the step path matches the full-sequence forward exactly (the
  cold-start differs, as in the reference: rings start at zero while the
  full pass clamps anchors to t=0).
"""
from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .phase import Mixer, add_hypersphere_phase_heads

__all__ = [
    "circular_student_t",
    "MOEMLP",
    "BlockFastBlock",
    "BlockFastLM",
    "blockfast_init_state",
    "blockfast_step",
]


def circular_student_t(center, e: int, v: float):
    """center: (...,) -> weights (..., E); Student-t pdf over circular bins."""
    idx = jnp.arange(e, dtype=center.dtype)
    c = center[..., None]
    c = c - jnp.floor(c / e) * e
    delta = jnp.abs(idx - c)
    d = jnp.minimum(delta, float(e) - delta)
    w = jnp.power(1.0 + (d * d) / v, -0.5 * (v + 1.0))
    return w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-12)


class _MLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(4 * d)(x))
        return nn.Dense(d)(h)


class MOEMLP(nn.Module):
    """Experts blended by circular-Student-t weights of the phase scalar."""

    num_experts: int
    v: float = 2.718281828459045  # e, the reference's default

    @nn.compact
    def __call__(self, x, scalar):
        s = (scalar * self.num_experts) % self.num_experts
        w = circular_student_t(s, self.num_experts, self.v)  # (..., E)
        outs = jnp.stack(
            [_MLP(name=f"expert_{i}")(x) for i in range(self.num_experts)], axis=-2
        )  # (..., E, C)
        return jnp.sum(w[..., None] * outs, axis=-2)


class BlockFastBlock(nn.Module):
    num_heads: int
    dw_kernel: int = 3

    @nn.compact
    def __call__(self, x):
        # phase.Mixer IS the mixer core; the step path reads its "dw"
        # param directly from params["attn"]["dw"]
        x_attn = Mixer(self.num_heads, self.dw_kernel, name="attn")(x)
        x_phase, scalar = add_hypersphere_phase_heads(
            x_attn, self.num_heads, return_scalar=True
        )
        moe = MOEMLP(self.num_heads, name="moe")(x_phase, scalar)
        return x + x_phase + moe


class BlockFastLM(nn.Module):
    """MachineIntelligence GPT: embeddings -> BlockFast stack -> head."""

    vocab_size: int
    n_embd: int = 64
    n_layer: int = 2
    n_head: int = 4

    @nn.compact
    def __call__(self, idx, targets=None):
        x = nn.Embed(self.vocab_size, self.n_embd, name="wte")(idx)
        for i in range(self.n_layer):
            x = BlockFastBlock(self.n_head, name=f"block_{i}")(x)
        logits = nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(x)
        if targets is None:
            return logits, None
        valid = targets != -1
        onehot = jax.nn.one_hot(jnp.maximum(targets, 0), self.vocab_size)
        nll = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
        return logits, loss


# ---------------------------------------------------------------------------
# incremental (per-token) inference states — functional carries
# ---------------------------------------------------------------------------


class PhaseState(NamedTuple):
    rb_v: jax.Array        # (B, S-1, D, E) ring of normalized raw head vecs
    dptr: jax.Array        # () int32
    v_all_prev: jax.Array  # (B, S, E) previous processed normalized heads
    s_prev: jax.Array      # (B, S) previous across-head normalized cosines


def _phase_init(b, s, e, dtype):
    d = max(s - 1, 1)
    return PhaseState(
        rb_v=jnp.zeros((b, max(s - 1, 1), d, e), dtype),
        dptr=jnp.zeros((), jnp.int32),
        v_all_prev=jnp.zeros((b, s, e), dtype),
        s_prev=jnp.zeros((b, s), jnp.float32),
    )


def _cnorm(z, eps=1e-8):
    return z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)


def _phase_step(state: PhaseState, x_t, num_segs: int, eps: float,
                need_scalar: bool):
    b, c = x_t.shape
    e = c // num_segs
    d = max(num_segs - 1, 1)
    xh = x_t.reshape(b, num_segs, e)

    if num_segs > 1:
        v = _cnorm(xh[:, 1:], eps)  # (B, S-1, E)
        lags = jnp.arange(1, num_segs)
        slots = (state.dptr - lags) % d  # (S-1,)
        anchor = jnp.take_along_axis(
            state.rb_v, slots[None, :, None, None], axis=2
        )[:, :, 0]  # (B, S-1, E)
        cos = jnp.sum(v * jnp.conj(anchor), axis=-1)
        xproc = xh[:, 1:] + (cos / float(e))[..., None]
        xh_out = jnp.concatenate([xh[:, :1], xproc], axis=1)
        rb_v = jax.lax.dynamic_update_index_in_dim(
            state.rb_v, v, state.dptr % d, axis=2
        )
        dptr = (state.dptr + 1) % d
    else:
        xh_out = xh
        rb_v, dptr = state.rb_v, state.dptr

    y_t = xh_out.reshape(b, c)
    if not need_scalar:
        return PhaseState(rb_v, dptr, state.v_all_prev, state.s_prev), y_t, None

    v_all = _cnorm(xh_out, eps)
    cos1 = jnp.sum(v_all * jnp.conj(state.v_all_prev), axis=-1)
    if jnp.iscomplexobj(cos1):
        cos1 = cos1.real
    cos1 = jnp.clip(cos1, -1.0 + eps, 1.0 - eps).astype(jnp.float32)
    s_norm = cos1 / jnp.maximum(
        jnp.linalg.norm(cos1, axis=1, keepdims=True), eps
    )
    scalar = jnp.clip(jnp.sum(s_norm * state.s_prev, axis=1), -1.0 + eps, 1.0 - eps)
    return PhaseState(rb_v, dptr, v_all, s_norm), y_t, scalar


class MixerState(NamedTuple):
    phase: PhaseState
    dw_buf: jax.Array  # (B, k-1, C)


class BlockState(NamedTuple):
    mixer: MixerState
    phase: PhaseState


def blockfast_init_state(batch: int, n_embd: int, n_head: int, n_layer: int,
                         dw_kernel: int = 3):
    e = n_embd // n_head
    layers = []
    for _ in range(n_layer):
        layers.append(
            BlockState(
                mixer=MixerState(
                    phase=_phase_init(batch, n_head, e, jnp.complex64),
                    dw_buf=jnp.zeros((batch, dw_kernel - 1, n_embd), jnp.float32),
                ),
                phase=_phase_init(batch, n_head, e, jnp.float32),
            )
        )
    return layers


def _mixer_step(state: MixerState, x_t, params, num_segs: int, eps: float = 1e-16):
    w = params["attn"]["dw"]  # (k, C)
    y_t = jnp.fft.fft(x_t.astype(jnp.float32), axis=1)
    pstate, s_t, _ = _phase_step(state.phase, y_t, num_segs, eps, need_scalar=False)
    z_t = jnp.fft.ifft(s_t, axis=1).real  # (B, C)

    window = jnp.concatenate([state.dw_buf, z_t[:, None, :]], axis=1)  # (B, k, C)
    out = jnp.sum(window * w[None], axis=1)
    dw_buf = window[:, 1:]
    return MixerState(pstate, dw_buf), out.astype(x_t.dtype)


def blockfast_step(params, states, x_t, *, n_head: int):
    """One token through every BlockFast block.  ``params`` is the LM's
    block params list (``params['params'][f'block_{i}']``); embedding/head
    are applied by the caller.  Returns (new_states, y_t)."""
    new_states = []
    h = x_t
    for st, bp in zip(states, params):
        mstate, x_attn = _mixer_step(st.mixer, h, bp, n_head)
        pstate, x_phase, scalar = _phase_step(
            st.phase, x_attn, n_head, 1e-8, need_scalar=True
        )
        moe_out = _moe_apply(bp["moe"], x_phase, scalar, n_head)
        h = h + x_phase + moe_out
        new_states.append(BlockState(mixer=mstate, phase=pstate))
    return new_states, h


def _moe_apply(moe_params, x, scalar, num_experts, v=2.718281828459045):
    s = (scalar * num_experts) % num_experts
    w = circular_student_t(s, num_experts, v)

    def expert(p, a):
        h = jax.nn.gelu(a @ p["Dense_0"]["kernel"] + p["Dense_0"]["bias"])
        return h @ p["Dense_1"]["kernel"] + p["Dense_1"]["bias"]

    outs = jnp.stack(
        [expert(moe_params[f"expert_{i}"], x) for i in range(num_experts)], axis=-2
    )
    return jnp.sum(w[..., None] * outs, axis=-2)
