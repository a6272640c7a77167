"""Chained block-2x2 grid PCR vs the compact Thomas oracle.

The grid-resident moment solve (``ops/chained_pcr.py``) must reproduce the
knot-space tridiagonal solution exactly (f64) / to roundoff (f32), and its
solution channels must already be the forward/backward-propagated
per-sample moments.
"""
import numpy as np
import jax.numpy as jnp

from pyitd_tpu.ops.chained_pcr import chained_block_pcr
from pyitd_tpu.ops.tridiag import thomas_solve


def _random_system(rng, rows, n, density):
    mask = rng.random((rows, n)) < density
    mask[:, 0] = mask[:, -1] = False
    mask[:, 5] = True
    mask[:, n // 2] = True
    hL = rng.uniform(1.0, 50.0, (rows, n))
    hR = rng.uniform(1.0, 50.0, (rows, n))
    a, b, c = hL, 2.0 * (hL + hR), hR
    d = rng.normal(size=(rows, n)) * 10.0
    idx = np.arange(n)
    first = np.where(mask, idx, n).min(axis=1)
    last = np.where(mask, idx, -1).max(axis=1)
    for r in range(rows):
        a[r, first[r]] = 0.0
        c[r, last[r]] = 0.0
    return mask, a, b, c, d


def _compact_oracle(mask, a, b, c, d):
    rows, n = mask.shape
    M = np.zeros((rows, n))
    cap = int(mask.sum(axis=1).max())
    for r in range(rows):
        pos = np.where(mask[r])[0]
        k = len(pos)
        A = np.zeros(cap); B = np.ones(cap); C = np.zeros(cap); D = np.zeros(cap)
        A[:k], B[:k], C[:k], D[:k] = a[r, pos], b[r, pos], c[r, pos], d[r, pos]
        x = thomas_solve(jnp.asarray(A)[None], jnp.asarray(B)[None],
                         jnp.asarray(C)[None], jnp.asarray(D)[None],
                         jnp.asarray([k], dtype=jnp.int32))
        M[r, pos] = np.asarray(x, dtype=np.float64)[0, :k]
    return M


def _fills(mask, M):
    rows, n = mask.shape
    fwd = np.zeros_like(M)
    bwd = np.zeros_like(M)
    carry = np.zeros(rows)
    for g in range(n):
        carry = np.where(mask[:, g], M[:, g], carry)
        fwd[:, g] = carry
    carry = np.zeros(rows)
    for g in range(n - 1, -1, -1):
        carry = np.where(mask[:, g], M[:, g], carry)
        bwd[:, g] = carry
    return fwd, bwd


def test_chained_pcr_matches_thomas():
    rng = np.random.default_rng(3)
    for n, density in [(513, 0.6), (1024, 0.04), (640, 0.66)]:
        mask, a, b, c, d = _random_system(rng, 2, n, density)
        M = _compact_oracle(mask, a, b, c, d)
        fwd, bwd = _fills(mask, M)
        scale = np.abs(M).max()

        u64, w64 = chained_block_pcr(
            jnp.asarray(mask), jnp.asarray(a), jnp.asarray(b),
            jnp.asarray(c), jnp.asarray(d))
        dt = np.asarray(u64).dtype
        tol64 = 1e-12 if dt == np.float64 else 5e-5
        assert np.abs(np.asarray(u64) - fwd).max() / scale < tol64
        assert np.abs(np.asarray(w64) - bwd).max() / scale < tol64

        f32 = lambda x: jnp.asarray(x, jnp.float32)
        u32, w32 = chained_block_pcr(jnp.asarray(mask), f32(a), f32(b),
                                     f32(c), f32(d))
        assert np.abs(np.asarray(u32) - fwd).max() / scale < 5e-5
        assert np.abs(np.asarray(w32) - bwd).max() / scale < 5e-5


def test_chained_pcr_empty_and_single():
    """No marked cells -> all-zero solution; one marked cell -> d/b there,
    propagated forward/backward."""
    n = 96
    z = jnp.zeros((1, n), jnp.float32)
    mask = jnp.zeros((1, n), bool)
    u, w = chained_block_pcr(mask, z, jnp.ones_like(z), z, z)
    assert float(jnp.max(jnp.abs(u))) == 0.0
    assert float(jnp.max(jnp.abs(w))) == 0.0

    mask = mask.at[0, 37].set(True)
    b = jnp.ones_like(z) * 4.0
    d = jnp.ones_like(z) * 8.0
    u, w = chained_block_pcr(mask, z, b, z, d)
    u, w = np.asarray(u), np.asarray(w)
    assert np.allclose(u[0, 37:], 2.0) and np.allclose(u[0, :37], 0.0)
    assert np.allclose(w[0, :38], 2.0) and np.allclose(w[0, 38:], 0.0)


def test_spike_matches_grid_pcr_interpret():
    """The Pallas SPIKE solver (interpret mode) matches the full-grid
    chained PCR across block boundaries, multi-block and padded sizes."""
    from pyitd_tpu.ops.pallas_spike import chained_block_spike, SPIKE_BLK

    rng = np.random.default_rng(11)
    # multi-block + sub-block + exact block multiple (no padding branch)
    for n in (SPIKE_BLK * 2 + 1777, 3000, SPIKE_BLK):
        mask, a, b, c, d = _random_system(rng, 2, n, 0.3)
        f32 = lambda x: jnp.asarray(x, jnp.float32)
        u0, w0 = chained_block_pcr(jnp.asarray(mask), f32(a), f32(b),
                                   f32(c), f32(d))
        u1, w1 = chained_block_spike(jnp.asarray(mask), f32(a), f32(b),
                                     f32(c), f32(d), interpret=True)
        scale = float(jnp.max(jnp.abs(u0))) + 1e-30
        assert float(jnp.max(jnp.abs(u1 - u0))) / scale < 5e-5
        assert float(jnp.max(jnp.abs(w1 - w0))) / scale < 5e-5


def test_spike_zero_knot_block_interpret():
    """A whole SPIKE block with no knots (possible at low extrema density
    when n >> 8192): the interface solve must carry the chain straight
    through the knot-free block (ADVICE r2 item 4)."""
    from pyitd_tpu.ops.pallas_spike import chained_block_spike, SPIKE_BLK

    rng = np.random.default_rng(13)
    n = SPIKE_BLK * 3
    mask, a, b, c, d = _random_system(rng, 2, n, 0.3)
    # empty out the middle block entirely
    mask[:, SPIKE_BLK : 2 * SPIKE_BLK] = False
    # rebuild boundary-coupling zeros consistent with the new mask: the
    # first/last marked rows must have no outward coupling
    for r in range(mask.shape[0]):
        idx = np.where(mask[r])[0]
        a[r, idx[0]] = 0.0
        c[r, idx[-1]] = 0.0
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    u0, w0 = chained_block_pcr(jnp.asarray(mask), f32(a), f32(b), f32(c),
                               f32(d))
    u1, w1 = chained_block_spike(jnp.asarray(mask), f32(a), f32(b), f32(c),
                                 f32(d), interpret=True)
    scale = float(jnp.max(jnp.abs(u0))) + 1e-30
    assert float(jnp.max(jnp.abs(u1 - u0))) / scale < 5e-5
    assert float(jnp.max(jnp.abs(w1 - w0))) / scale < 5e-5
