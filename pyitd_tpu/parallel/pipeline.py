"""Pipeline parallelism: a GPipe-style microbatch pipeline over a 'pp'
mesh axis.

The reference has no distributed ML (SURVEY.md §2.5); together with
``parallel/train.py`` (dp x tp, ep) and ``parallel/sharded.py`` (sequence
parallelism) this completes the mesh story for the ML family.  The design
is the standard TPU pipelining loop (scaling-book recipe): each device
holds one stage's parameters; microbatches tick through ``M + pp - 1``
steps of a ``lax.scan``; activations hop one stage per tick over a single
ICI ``ppermute``; the first stage injects microbatch ``t`` and the last
stage records microbatch ``t - (pp - 1)``.  Everything is a fixed-shape
scan — XLA overlaps the per-tick compute with the permute.

The pipeline composes with data parallelism: on a ``('data', 'pp')`` mesh
the microbatch rows split over 'data' (each data shard runs its own
pipeline) while stages split over 'pp'.

Bubble accounting is the usual GPipe ratio ``(pp - 1) / (M + pp - 1)``:
choose ``n_micro >> pp`` to amortize.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["gpipe_apply", "stack_stage_params"]


def stack_stage_params(stage_params: list):
    """Stack per-stage param pytrees along a new leading 'stage' axis.

    The result is what :func:`gpipe_apply` consumes: every leaf gets shape
    ``(pp, ...)`` and is sharded ``P('pp', ...)`` so each device holds
    exactly its stage's weights.
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *stage_params)


def gpipe_apply(
    block_fn: Callable,
    mesh: Mesh,
    n_micro: int,
    pp_axis: str = "pp",
    data_axis: str | None = "data",
    compute_dtype=None,
):
    """Build a pipelined apply: ``f(stacked_params, x) -> y``.

    ``block_fn(stage_params, x) -> x`` is one stage (same activation shape
    in and out — the residual-block contract of every model in ``ml/``).
    ``stacked_params`` has a leading stage axis of size ``mesh.shape[pp_axis]``
    (see :func:`stack_stage_params`); ``x`` is ``(n_micro, mb, ...)``
    microbatch-major.  The returned callable is jitted with shard_map
    specs: params split over 'pp' on the stage axis, activations'
    microbatch rows split over 'data' (when the mesh has that axis),
    outputs replicated over 'pp'.

    Semantically ``f(params, x)[m] == block_(pp-1)(... block_0(x[m]))`` —
    the sequential fold — which is what the tests pin, grads included.

    ``compute_dtype`` (e.g. ``jnp.bfloat16``) applies the same
    mixed-precision recipe as ``parallel.train.make_train_step``: floating
    stage params are cast inside the pipelined function (so callers'
    grads come back in master precision) and the stage contract
    (activation shape/dtype preserved) is checked against the cast dtype.
    """
    pp = mesh.shape[pp_axis]
    data_axis = data_axis if data_axis in mesh.shape else None
    row = (data_axis,) if data_axis else (None,)

    def local(params, x):
        # params: this stage's tree (leading axis already stripped to 1)
        params = jax.tree.map(lambda a: a[0], params)
        if compute_dtype is not None:
            params = jax.tree.map(
                lambda a: a.astype(compute_dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a, params)
            x = x.astype(compute_dtype) if jnp.issubdtype(
                x.dtype, jnp.floating) else x
        idx = lax.axis_index(pp_axis)

        def tick(carry, t):
            state, outs = carry
            inject = x[jnp.clip(t, 0, n_micro - 1)]
            xin = jnp.where(idx == 0, inject, state)
            y = block_fn(params, xin)
            if y.shape != xin.shape or y.dtype != xin.dtype:
                raise TypeError(
                    "gpipe stage must preserve activation shape/dtype: "
                    f"{xin.shape}/{xin.dtype} -> {y.shape}/{y.dtype}"
                )
            m = t - (pp - 1)
            mc = jnp.clip(m, 0, n_micro - 1)
            take = (idx == pp - 1) & (m >= 0)
            rec = jnp.where(take, y, lax.dynamic_index_in_dim(outs, mc, 0, False))
            outs = lax.dynamic_update_index_in_dim(outs, rec, mc, 0)
            state = lax.ppermute(
                y, pp_axis, [(i, i + 1) for i in range(pp - 1)]
            )
            return (state, outs), None

        # the carries vary over 'pp' from the first hop on; declare that on
        # the zero-init too or the scan's carry types mismatch (check_vma)
        from .sharded import _vary

        state0 = _vary(jnp.zeros_like(x[0]), (pp_axis,))
        outs0 = _vary(jnp.zeros_like(x), (pp_axis,))
        (state, outs), _ = lax.scan(
            tick, (state0, outs0), jnp.arange(n_micro + pp - 1)
        )
        # only the last stage holds real outputs; the psum replicates them
        # to every stage (and, for pp == 1, is the identity)
        return lax.psum(jnp.where(idx == pp - 1, outs, 0.0), pp_axis)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(pp_axis), P(None, *row)),
        out_specs=P(None, *row),
    )
    return jax.jit(fn)
