import numpy as np
import jax.numpy as jnp

from pyitd_tpu.ops.extrema import extrema_mask, extrema_masks, count_extrema, compact_indices
from reference.itd_ref import find_extrema


def _signals():
    rng = np.random.default_rng(0)
    yield np.sin(np.linspace(0, 20, 257)) + 0.3 * np.cos(np.linspace(0, 90, 257))
    yield rng.normal(size=400)
    T = np.linspace(0, 2 * np.pi, 400)
    yield np.sin(20 * T * (1 + 0.2 * T)) + T**2 + np.sin(13 * T)  # ITD.py demo chirp
    # plateaus: rightmost sample of a flat top/bottom must win
    yield np.array([0.0, 1.0, 1.0, 1.0, 0.0, -1.0, -1.0, 0.0, 2.0, 0.0])
    yield np.array([0.0, 1.0, 0.0, 1.0, 0.0, 1.0, 0.0])  # zigzag: all interior
    yield np.zeros(16)  # constant: no extrema


def test_matches_reference_indices():
    for s in _signals():
        mask = np.asarray(extrema_mask(jnp.asarray(s)))
        got = np.where(mask)[0]
        want = find_extrema(s)
        np.testing.assert_array_equal(got, want, err_msg=f"signal {s[:6]}")


def test_min_max_disjoint_and_counts():
    for s in _signals():
        m = extrema_masks(jnp.asarray(s))
        assert not np.any(np.asarray(m.minima) & np.asarray(m.maxima))
        assert int(count_extrema(jnp.asarray(s))) == find_extrema(s).size


def test_nan_quarantine():
    s = np.sin(np.linspace(0, 30, 200))
    s[50] = np.nan
    mask = np.asarray(extrema_mask(jnp.asarray(s)))
    got = set(np.where(mask)[0])
    assert got & {49, 50, 51} == set()
    # away from the NaN, extrema agree with the clean signal's
    clean = set(find_extrema(np.sin(np.linspace(0, 30, 200))))
    far = {i for i in clean if abs(i - 50) > 2}
    assert far <= got


def test_batched():
    sigs = np.stack([np.sin(np.linspace(0, k, 128)) for k in (10, 25, 40)])
    mask = np.asarray(extrema_mask(jnp.asarray(sigs)))
    for row, s in zip(mask, sigs):
        np.testing.assert_array_equal(np.where(row)[0], find_extrema(s))


def test_compact_indices():
    s = np.sin(np.linspace(0, 25, 300))
    mask = extrema_mask(jnp.asarray(s))
    idx, count = compact_indices(mask, capacity=64)
    want = find_extrema(s)
    assert int(count) == want.size
    np.testing.assert_array_equal(np.asarray(idx)[: want.size], want)
    assert np.all(np.asarray(idx)[want.size :] == s.size - 1)
