"""Varying-mesh-axes helpers shared by the shard_map-aware modules.

Under ``shard_map(..., check_vma=True)`` (the default), every freshly
created constant (``jnp.zeros`` etc.) is *unvaried* over the mesh, while
values derived from sharded operands are *varying*.  Loop carries must
enter with the vma set their updates will have (``fori_loop``/``scan``
require carry-in == carry-out types), and elementwise ops require equal
vma on all operands — so zero-initialized state has to be explicitly
promoted.  jax renamed the promotion primitive (``lax.pvary`` ->
``lax.pcast(..., to="varying")``); this shim dispatches on availability
so there is exactly one copy of the version test in the package.
"""
from __future__ import annotations

import jax
from jax import lax

__all__ = ["vary"]


def vary(a, axes):
    """Promote ``a``'s varying-mesh-axes set to include ``axes``."""
    have = getattr(jax.typeof(a), "vma", ())
    need = tuple(ax for ax in axes if ax not in have)
    if not need:
        return a
    if hasattr(lax, "pcast"):
        return lax.pcast(a, need, to="varying")
    return lax.pvary(a, need)
