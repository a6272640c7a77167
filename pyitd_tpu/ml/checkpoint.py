"""Training-state checkpointing for the ML family.

The reference saves/loads torch ``state_dict``s ad hoc (``simple_model.pth``
in ``.MISSING_LARGE_BLOBS``; SURVEY.md §5 "checkpoint/resume").  The
TPU-native equivalent is orbax: atomic on-disk pytree checkpoints of
(params, opt_state, step, ...) that restore **sharding-aware** — pass the
live (or abstract) pytree as ``like`` and every leaf comes back with its
GSPMD layout, so a run sharded by ``parallel.train`` resumes with the same
(data, model) placement without a host-side gather/scatter round trip.
"""
from __future__ import annotations

import os
from typing import Any

import jax

__all__ = ["save_state", "restore_state"]


def _ocp():
    # Lazy: orbax is part of the optional [ml] extra, and environments that
    # predate it must still be able to import pyitd_tpu.ml for the rest of
    # the model family.
    import orbax.checkpoint as ocp

    return ocp


def save_state(path: str | os.PathLike, state: Any) -> None:
    """Write ``state`` (any jax pytree) to ``path`` (a directory), atomically.

    Overwrites an existing checkpoint at the same path.
    """
    ckptr = _ocp().StandardCheckpointer()
    ckptr.save(os.path.abspath(os.fspath(path)), state, force=True)
    ckptr.wait_until_finished()


def restore_state(path: str | os.PathLike, like: Any) -> Any:
    """Read the checkpoint at ``path`` shaped/sharded like ``like``.

    ``like`` may hold live arrays or ``jax.ShapeDtypeStruct``s; each leaf's
    sharding (if any) is applied to the restored array, so restoring onto a
    mesh-sharded template reproduces the original distributed layout.
    """
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=getattr(a, "sharding", None))
        if hasattr(a, "shape")
        else a,
        like,
    )
    ckptr = _ocp().StandardCheckpointer()
    return ckptr.restore(os.path.abspath(os.fspath(path)), abstract)
