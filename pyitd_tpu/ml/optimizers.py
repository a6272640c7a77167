"""Wolf / Phoenix optimizers as optax gradient transformations.

Behavioral contract (``/root/reference/Wolf.py``):

* **Wolf** (``Wolf.py:49-83``): leaky-integrator momentum with rate
  1/e — ``update = p·(1-1/e) + g/e``, ``p <- p·(1-1/e) + update/e`` — then
  multiplicative uniform noise (±1/e), and sign-agreement gating: where the
  integrated update agrees in sign with the raw gradient, step along it;
  where it disagrees, decay the parameter toward zero by ``lr``.
* **Phoenix** (``Wolf.py:90-172``): a cascade of M leaky integrators with
  per-order rates ``e^{-(i+1)}``, elementwise directional confidence
  (fraction of integrators agreeing with the mean) + magnitude confidence
  (inverse spread), updates gated by the fastest integrator's sign.

Implemented as pure optax-style transformations; the parameter-decay branch
of Wolf needs the parameter values, so pass ``params`` to ``update`` (optax
supports this).  Randomness comes from an explicit seed carried in state.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["wolf", "phoenix"]

_ETC = 0.367879441  # 1/e, the reference's integrator rate
_ET = 1.0 - _ETC


class WolfState(NamedTuple):
    p: optax.Updates
    key: jax.Array


def wolf(learning_rate: float = 2e-3, seed: int = 0) -> optax.GradientTransformation:
    def init(params):
        return WolfState(
            p=jax.tree.map(jnp.zeros_like, params), key=jax.random.PRNGKey(seed)
        )

    def update(grads, state, params=None):
        if params is None:
            raise ValueError("wolf requires params (sign-disagreement decay)")
        key, sub = jax.random.split(state.key)
        leaves = jax.tree.leaves(grads)
        keys = list(jax.random.split(sub, len(leaves)))
        keys_tree = jax.tree.unflatten(jax.tree.structure(grads), keys)

        def one(g, p_int, w, k):
            upd = p_int * _ET + g * _ETC
            new_p = p_int * _ET + upd * _ETC
            agree = jnp.sign(upd) * jnp.sign(g) > 0
            noise = (jax.random.uniform(k, upd.shape, upd.dtype) * 2.0 - 1.0)
            upd = upd + noise * _ETC * upd
            # agreement: -lr*update; disagreement: decay param toward zero
            delta = jnp.where(agree, -learning_rate * upd, -w * learning_rate)
            return delta, new_p

        flat = jax.tree.map(one, grads, state.p, params, keys_tree)
        deltas = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda t: isinstance(t, tuple))
        new_ps = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda t: isinstance(t, tuple))
        return deltas, WolfState(p=new_ps, key=key)

    return optax.GradientTransformation(init, update)


class PhoenixState(NamedTuple):
    integrators: tuple  # tuple of M pytrees
    key: jax.Array


def phoenix(learning_rate: float = 1e-2, m: int = 7, noise_scale: float = 0.0,
            eps: float = 1e-6, seed: int = 0) -> optax.GradientTransformation:
    etc = [math.exp(-(i + 1)) for i in range(m)]
    et = [1.0 - e for e in etc]

    def init(params):
        return PhoenixState(
            integrators=tuple(jax.tree.map(jnp.zeros_like, params) for _ in range(m)),
            key=jax.random.PRNGKey(seed),
        )

    def update(grads, state, params=None):
        del params
        key, sub = jax.random.split(state.key)
        leaves = jax.tree.leaves(grads)
        keys_tree = jax.tree.unflatten(
            jax.tree.structure(grads), list(jax.random.split(sub, len(leaves)))
        )

        def one(g, k, *ints):
            u = learning_rate * g
            new_ints = []
            for i in range(m):
                cur = ints[i] * et[i] + etc[i] * (u if i == 0 else new_ints[i - 1])
                new_ints.append(cur)
            stack = jnp.stack(new_ints)
            mean = jnp.mean(stack, axis=0)
            dir_conf = jnp.mean((jnp.sign(stack) * jnp.sign(mean) > 0).astype(u.dtype), axis=0)
            spread = jnp.max(jnp.abs(stack), axis=0) - jnp.min(jnp.abs(stack), axis=0)
            mag_conf = 1.0 / (spread + eps)
            conf = 0.5 * (dir_conf + mag_conf)

            contribs = [etc[0] * u] + [etc[i] * new_ints[i - 1] for i in range(1, m)]
            upd = sum(contribs) / m
            if noise_scale > 0.0:  # reference: noise precedes the gate
                upd = upd + noise_scale * (
                    2.0 * jax.random.uniform(k, upd.shape, upd.dtype) - 1.0
                ) * upd
            gated = jnp.where(jnp.sign(new_ints[0]) * jnp.sign(upd) > 0,
                              conf * upd, jnp.zeros_like(upd))
            return (-gated,) + tuple(new_ints)

        flat = jax.tree.map(one, grads, keys_tree, *state.integrators)
        is_tup = lambda t: isinstance(t, tuple)
        deltas = jax.tree.map(lambda t: t[0], flat, is_leaf=is_tup)
        new_ints = tuple(
            jax.tree.map(lambda t, i=i: t[1 + i], flat, is_leaf=is_tup) for i in range(m)
        )
        return deltas, PhoenixState(integrators=new_ints, key=key)

    return optax.GradientTransformation(init, update)
