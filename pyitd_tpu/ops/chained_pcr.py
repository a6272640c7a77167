"""Grid-resident spline-moment solve: chained block-2x2 parallel cyclic
reduction.

The MEITD-tier cubic baseline needs the tridiagonal moment system solved
over the *knot* axis, but at noise-driven extrema densities the knot count
is ~2n/3 and every compact<->grid movement (scatter of positions, gather of
knot values, scatter of moments) costs ~30-40 ms at 1M points on v5e —
that data movement, not the solve, dominated the tier
(``/root/repo/NOTES_ROUND2.md``).  This module solves the knot-space system
**directly on the signal grid**, where every per-knot quantity already
lives after the fill kernels, so no compact buffers exist at all.

Formulation.  Give every grid cell ``g`` two unknowns ``(u_g, w_g)``:

* unmarked cell: ``u_g = u_{g-1}`` and ``w_g = w_{g+1}`` (pass-through
  chain rows — pointer doubling in matrix form),
* marked cell (an interior knot with tridiagonal row ``a M_prev + b M_g +
  c M_next = d`` in knot space): ``a·u_{g-1} + b·u_g + c·w_{g+1} = d`` and
  the tie ``w_g = u_g``.

Chains carry the nearest interior-knot moment across the gaps, so the
block-tridiagonal grid system (2x2 blocks, couplings at grid distance 1)
is exactly the knot-space system.  Solving it with block PCR costs
``log2(n)`` full-vector elementwise rounds — pure stencil traffic that XLA
fuses, no gathers — and the solution is *already expanded*: ``u_g`` is the
moment of the last interior knot at-or-before ``g`` and ``w_g`` of the
next at-or-after ``g``, which is exactly what the baseline evaluation
needs per sample (it replaces a moments scatter *and* a third fill round).

Sparsity is preserved under PCR and cuts the state to 8 channels:
``A = [[al,0],[0,0]]``, ``B = [[b11,b12],[b21,1]]`` (``b22`` provably
stays 1), ``C = [[0,cg],[0,cw]]``, ``D = (d1,d2)``.

Stability: the knot rows are strictly diagonally dominant (spline moment
systems: ``b = 2(h_{i-1}+h_i)`` vs off-diagonals ``h``) and the chain rows
are orthogonal transports; absorbing a knot into a chain multiplies by
``c/b <= 1/2``, so the recursion contracts exactly like scalar PCR on the
dominant compact system (validated against the f64 compact Thomas solve in
``tests/test_chained_pcr.py``).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["chained_block_pcr"]


def _safe_inv(x):
    return 1.0 / jnp.where(x == 0, jnp.ones_like(x), x)


def chained_block_pcr(mask, a, b, c, d):
    """Solve the knot-space tridiagonal system on the grid.

    Args:
      mask: (..., n) bool — True at interior-knot cells.
      a, b, c, d: (..., n) float — the knot-space tridiagonal row at marked
        cells (``a`` couples to the previous marked cell's unknown, ``c``
        to the next); ignored at unmarked cells.  Rows whose neighbor
        coupling must not exist (first/last interior row after boundary
        substitution) must pass ``a = 0`` / ``c = 0`` there.

    Returns:
      (u, w): (..., n) float — ``u[g]`` the solution at the last marked
      cell <= g (0 before the first), ``w[g]`` at the next marked cell
      >= g (0 after the last).
    """
    n = mask.shape[-1]
    one = jnp.ones_like(b)
    zero = jnp.zeros_like(b)

    # 8-channel block state; chain rows are (al=-1, b=I, cw=-1).
    al = jnp.where(mask, a, -one)
    b11 = jnp.where(mask, b, one)
    b12 = zero
    b21 = jnp.where(mask, -one, zero)
    cg = jnp.where(mask, c, zero)
    cw = jnp.where(mask, zero, -one)
    d1 = jnp.where(mask, d, zero)
    d2 = zero

    def shift_r(x, s, fill):
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)

    def shift_l(x, s, fill):
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([x[..., s:], pad], axis=-1)

    s = 1
    while s < n:
        # neighbors at distance s; out-of-range -> identity row, zero rhs
        b11m, b12m, b21m = (shift_r(b11, s, 1.0), shift_r(b12, s, 0.0),
                            shift_r(b21, s, 0.0))
        alm = shift_r(al, s, 0.0)
        cgm, cwm = shift_r(cg, s, 0.0), shift_r(cw, s, 0.0)
        d1m, d2m = shift_r(d1, s, 0.0), shift_r(d2, s, 0.0)

        b11p, b12p, b21p = (shift_l(b11, s, 1.0), shift_l(b12, s, 0.0),
                            shift_l(b21, s, 0.0))
        alp = shift_l(al, s, 0.0)
        cgp, cwp = shift_l(cg, s, 0.0), shift_l(cw, s, 0.0)
        d1p, d2p = shift_l(d1, s, 0.0), shift_l(d2, s, 0.0)

        # E = -A·inv(B_m): row 2 is zero because A's is.
        idetm = _safe_inv(b11m - b12m * b21m)
        e11 = -al * idetm
        e12 = al * b12m * idetm
        # F = -C·inv(B_p): full 2x2.
        idetp = _safe_inv(b11p - b12p * b21p)
        f11 = cg * b21p * idetp
        f12 = -cg * b11p * idetp
        f21 = cw * b21p * idetp
        f22 = -cw * b11p * idetp

        b11 = b11 + f11 * alp
        b12 = b12 + e11 * cgm + e12 * cwm
        b21 = b21 + f21 * alp
        d1 = d1 + e11 * d1m + e12 * d2m + f11 * d1p + f12 * d2p
        d2 = d2 + f21 * d1p + f22 * d2p
        al = e11 * alm
        cg = f11 * cgp + f12 * cwp
        cw = f21 * cgp + f22 * cwp
        s <<= 1

    idet = _safe_inv(b11 - b12 * b21)
    u = (d1 - b12 * d2) * idet
    w = (b11 * d2 - b21 * d1) * idet
    return u, w
