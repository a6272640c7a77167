"""Batch/data-parallel conveniences.

The natural parallel axis of this framework is the signal bank (ensemble
members × channels × batch — SURVEY.md §2.5): :func:`pjit_itd_sift` returns
a jitted sift whose inputs/outputs carry explicit ``NamedSharding`` so the
same callable works single-host or multi-host (GSPMD partitions the batch
over 'data'; pair with ``parallel.sharded`` when the *time* axis must also
split).
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..decomp.itd import itd_sift

__all__ = ["pjit_itd_sift", "shard_bank"]


def shard_bank(x, mesh: Mesh):
    """Place a (batch, n) signal bank with the batch axis over 'data'."""
    return jax.device_put(x, NamedSharding(mesh, P("data", None)))


def pjit_itd_sift(mesh: Mesh, max_iteration: int = 11, **kwargs):
    """A compiled batched sift with explicit data-parallel shardings."""
    sharding = NamedSharding(mesh, P("data", None))
    out_rot = NamedSharding(mesh, P(None, "data", None))
    out_scalar = NamedSharding(mesh, P("data"))

    @partial(
        jax.jit,
        in_shardings=(sharding,),
        out_shardings=(out_rot, out_rot, out_scalar, out_scalar),
    )
    def fn(x):
        res = itd_sift(x, max_iteration, **kwargs)
        return res.rotations, res.baselines, res.num_components, res.stop_reason

    return fn
