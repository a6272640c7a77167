"""Model-parallel training for the ML family: GSPMD sharding rules + a
pjit train step.

The reference has no distributed ML of any kind (SURVEY.md §2.5) — its
models are single-GPU torch modules (T.py, RMLP.py, VTE.py).  This module
is the TPU-native scaling story for their flax ports: parameters are
annotated with ``NamedSharding``s derived from regex rules over the param
path (megatron-style tensor parallelism: column-parallel up-projections,
row-parallel down-projections, sharded embedding/vocab dims, expert banks
over the 'model' axis), the batch rides the 'data' axis, and one plain
``jax.jit`` train step lets GSPMD insert the ICI collectives.  No
shard_map is needed here — unlike the Pallas sift kernels, these models
are pure XLA ops with full partitioning rules.

Typical use (see ``tests/test_train_parallel.py`` and
``__graft_entry__.dryrun_multichip``)::

    mesh   = make_tp_mesh(8, model=4)               # (data=2, model=4)
    specs  = param_specs(params, PARSEVAL_TP_RULES)
    params = shard_params(params, mesh, PARSEVAL_TP_RULES)
    step   = make_train_step(loss_fn, tx, mesh, specs)
    batch  = shard_batch(batch, mesh)
    params, opt_state, loss = step(params, opt_state, batch)
"""
from __future__ import annotations

import re
from typing import Any, Callable, Sequence, Tuple, TYPE_CHECKING

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

if TYPE_CHECKING:  # annotation-only; optax is an optional [ml] dependency
    import optax

__all__ = [
    "make_tp_mesh",
    "PARSEVAL_TP_RULES",
    "MOE_EP_RULES",
    "param_specs",
    "shard_params",
    "shard_batch",
    "make_train_step",
]

Rules = Sequence[Tuple[str, P]]


def make_tp_mesh(n_devices: int | None = None, model: int | None = None) -> Mesh:
    """A (data, model) mesh over the first ``n_devices`` devices.

    ``model`` is the tensor/expert-parallel degree (defaults to 2 when the
    device count allows).  The 'model' axis is the minor (fastest-varying)
    one so tensor-parallel collectives ride neighboring ICI links.
    """
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    if model is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
    if n % model:
        raise ValueError(f"n_devices={n} not divisible by model={model}")
    return Mesh(np.asarray(devs).reshape(n // model, model), ("data", "model"))


# Megatron-style rules for ml.parseval.ParsevalGPT (T.py's transformer):
# up-projections column-parallel, down-projections row-parallel, embedding
# and LM head vocab-side activations sharded on 'model'.  w_q stays
# replicated — its per-step QR dual frame (T.py:173-183) is a small
# (d, d) factorization GSPMD would all-gather anyway.
PARSEVAL_TP_RULES: Rules = (
    (r"wte/embedding$", P(None, "model")),
    (r"attn/w_v/kernel$", P(None, "model")),
    (r"attn/w_o/kernel$", P("model", None)),
    (r"mlp/Dense_0/kernel$", P(None, "model")),
    (r"mlp/Dense_1/kernel$", P("model", None)),
    (r"lm_head/kernel$", P(None, "model")),
)

# Expert-parallel rules for ml.moe.ModCRTMoE(dispatch="capacity"): the
# expert-stacked banks split over 'model', so each device holds E/model
# experts and GSPMD turns the dispatch einsums into token all-to-alls.
MOE_EP_RULES: Rules = (
    (r"/W1$", P("model", None, None)),
    (r"/W2$", P("model", None, None)),
    (r"/b2$", P("model", None)),
)


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        else:  # pragma: no cover - exotic pytree keys
            parts.append(str(k))
    return "/".join(parts)


def param_specs(params, rules: Rules, default: P = P()):
    """Map each param to the PartitionSpec of the first matching rule.

    Rules are ``(regex, PartitionSpec)`` matched with ``re.search`` against
    the slash-joined param path (e.g. ``params/block_0/mlp/Dense_0/kernel``);
    unmatched params are replicated.
    """

    def spec(path, leaf):
        s = _path_str(path)
        for pat, ps in rules:
            if re.search(pat, s):
                return ps
        return default

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params(params, mesh: Mesh, rules: Rules):
    """Place a param pytree on ``mesh`` per ``rules`` (replicate the rest)."""
    specs = param_specs(params, rules)
    return jax.tree.map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)), params, specs
    )


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Shard every leaf's leading (batch) dimension over ``axis``."""
    return jax.tree.map(
        lambda b: jax.device_put(
            b, NamedSharding(mesh, P(axis, *([None] * (b.ndim - 1))))
        ),
        batch,
    )


def make_train_step(
    loss_fn: Callable[[Any, Any], jax.Array],
    tx: optax.GradientTransformation,
    mesh: Mesh,
    specs,
    compute_dtype=None,
) -> Callable:
    """One jitted SGD step with the param layout pinned across steps.

    ``loss_fn(params, batch) -> scalar``.  Grads and updated params are
    constrained back to ``specs`` so the tensor-parallel layout is stable
    over the whole run (optimizer state initialized from sharded params
    inherits the layout; without the constraint XLA may locally prefer a
    replicated output and re-shard every step).

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) enables the TPU
    mixed-precision recipe: the forward/backward pass runs with floating
    params cast to that dtype (MXU-native GEMMs), while the master
    weights, gradients, and optimizer state stay in the params' own
    precision — the cast is inside the differentiated function, so grads
    come back in master precision.
    """
    import jax.numpy as jnp
    import optax  # deferred: callers constructing a `tx` already have it

    constraint = jax.tree.map(lambda s: NamedSharding(mesh, s), specs)

    def cast(p):
        if compute_dtype is None:
            return p
        return jax.tree.map(
            lambda a: a.astype(compute_dtype)
            if jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            p,
        )

    @jax.jit
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(
            lambda p, b: loss_fn(cast(p), b)
        )(params, batch)
        grads = jax.lax.with_sharding_constraint(grads, constraint)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.lax.with_sharding_constraint(params, constraint)
        return params, opt_state, loss

    return step
