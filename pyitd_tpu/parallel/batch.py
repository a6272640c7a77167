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

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["pjit_itd_sift", "shard_bank", "sharded_streaming_itd"]


def shard_bank(x, mesh: Mesh):
    """Place a (batch, n) signal bank with the batch axis over 'data'."""
    return jax.device_put(x, NamedSharding(mesh, P("data", None)))


def pjit_itd_sift(mesh: Mesh, max_iteration: int = 11, **kwargs):
    """A compiled batched sift with explicit data-parallel shardings.

    The sift runs under ``shard_map`` over the 'data' axis — each shard
    sifts its local rows independently (the sift has no cross-batch
    coupling), which both makes the zero-collective guarantee structural
    and keeps the TPU Pallas fast path usable: ``pallas_call`` has no
    GSPMD partitioning rule, so tracing it into a plain sharded ``jit``
    would replicate or fail on multi-device meshes.
    """
    sharding = NamedSharding(mesh, P("data", None))

    # PLATFORM-WA(interpret-vma): check_vma must relax when an
    # explicitly-requested Pallas backend will
    # run in INTERPRET mode (non-TPU): jax's HLO interpreter slices kernel
    # blocks with unvaried loop indices, which the vma checker rejects
    # (jax-ml/jax: "dynamic_slice requires varying manual axes to match").
    # Real-TPU lowerings type-check fine (the kernels declare out-shape
    # vma), and the local sift has no collectives over 'data', so relaxing
    # the check here only affects the interpret-parity path.
    interpret_pallas = (jax.default_backend() != "tpu"
                        and str(kwargs.get("backend", "auto")).startswith(
                            "pallas"))

    local = lambda x: itd_sift(x, max_iteration, **kwargs)
    fn = shard_map(
        lambda x: tuple(local(x)),
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(None, "data", None), P(None, "data", None),
                   P("data"), P("data"), P("data", None)),
        check_vma=not interpret_pallas,
    )

    @jax.jit
    def wrapped(x):
        xs = jax.device_put(x, sharding)
        rot, base, ncomp, reason, _corr = fn(xs)
        return rot, base, ncomp, reason

    return wrapped


def sharded_streaming_itd(mesh: Mesh, hop: int, *, iq: bool = False):
    """Block-protocol streaming over a channel bank, channels sharded on
    the 'data' mesh axis via ``shard_map``.

    Channel banks are the native tier's multi-channel use case
    (``itd.cpp:41-44``): every channel runs the 3-hop protocol
    independently, so each shard scans its local channels with **zero
    collectives** — shard_map makes that guarantee structural.  Returns a
    jitted callable ``f(x[channels, n]) -> (rotations, baselines, ready)``
    with hop-major outputs like :func:`...decomp.streaming.streaming_itd`.
    With ``iq=True`` channels are complex and outputs follow
    :func:`...decomp.streaming.streaming_itd_iq`.
    """
    from ..decomp.streaming import streaming_itd, streaming_itd_iq

    run = streaming_itd_iq if iq else streaming_itd

    fn = shard_map(
        partial(run, hop=hop),
        mesh=mesh,
        in_specs=P("data", None),
        out_specs=(P(None, "data", None), P(None, "data", None), P(None, "data")),
    )

    def wrapped(x):
        xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
        return jax.jit(fn)(xs)

    return wrapped
