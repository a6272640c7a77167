import math

import numpy as np
import jax.numpy as jnp

from pyitd_tpu.ops.wpe import weighted_permutation_entropy
from pyitd_tpu.decomp.meitd import meitd, xitd, first_rotation_is_proper


def ref_wpe(x, order=3, normalize=False):
    """Numpy oracle for the reference WPE pipeline."""
    n = len(x)
    w = n - order + 1
    emb = np.stack([x[i : i + w] for i in range(order)], axis=1)
    sorted_idx = emb.argsort(kind="quicksort", axis=1)
    weights = np.var(emb, axis=1)
    hashmult = order ** np.arange(order)
    hashval = (sorted_idx * hashmult).sum(1)
    acc = {}
    for hv, wt in zip(hashval, weights):
        acc[hv] = acc.get(hv, 0.0) + wt
    p = np.asarray(list(acc.values()))
    p = p / p.sum()
    ent = -(p * np.log2(p)).sum()
    if normalize:
        ent /= math.log2(math.factorial(order))
    return ent


def test_wpe_matches_reference():
    rng = np.random.default_rng(0)
    for sig in (
        rng.normal(size=300),
        np.sin(np.linspace(0, 20, 500)),
        np.sin(np.linspace(0, 20, 500)) + 0.1 * rng.normal(size=500),
    ):
        for norm in (False, True):
            got = float(weighted_permutation_entropy(jnp.asarray(sig), 3, normalize=norm))
            want = ref_wpe(sig, 3, norm)
            assert abs(got - want) < 1e-10, (got, want)


def test_wpe_extremes():
    # monotone signal: single pattern -> entropy 0
    mono = jnp.asarray(np.linspace(0.0, 1.0, 100) ** 2)
    assert float(weighted_permutation_entropy(mono, 3)) == 0.0
    # white noise: near-maximal normalized entropy
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.normal(size=5000))
    val = float(weighted_permutation_entropy(noise, 3, normalize=True))
    assert 0.9 < val <= 1.0


def test_wpe_batched():
    rng = np.random.default_rng(2)
    sigs = rng.normal(size=(3, 256))
    got = np.asarray(weighted_permutation_entropy(jnp.asarray(sigs), 3, normalize=True))
    for row, s in zip(got, sigs):
        assert abs(row - ref_wpe(s, 3, True)) < 1e-10


def _test_signal(n=600):
    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, n)
    return (
        np.sin(2 * np.pi * 30 * t)
        + 0.5 * np.sin(2 * np.pi * 7 * t)
        + 0.1 * rng.normal(size=n)
    )


def test_first_rotation_gate():
    s = _test_signal()
    rot, base, flag = first_rotation_is_proper(s, 0.6)
    assert flag in (0, 1)
    np.testing.assert_allclose(np.asarray(rot) + np.asarray(base), s, atol=1e-10)


def test_meitd_reconstructs():
    s = _test_signal()
    hi, lo, resid = meitd(s)
    total = np.asarray(resid).copy()
    for r in np.asarray(hi):
        total += r
    for r in np.asarray(lo):
        total += r
    np.testing.assert_allclose(total, s, atol=1e-9)
    assert hi.shape[0] + lo.shape[0] <= 21


def test_meitd_degenerate_returns_two_zero_rows():
    """Reference quirk (MEITD.py:413-414): < 4 extrema returns TWO zero
    components (not empty stacks), so XITD sees 3 rows; the jitted
    variant mirrors it through its counts."""
    from pyitd_tpu.decomp.meitd_jit import meitd_jit

    s = np.linspace(0.0, 1.0, 256)  # monotone: 0 extrema
    hi, lo, resid = meitd(s)
    assert hi.shape == (1, 256) and lo.shape == (1, 256)
    assert not np.any(np.asarray(hi)) and not np.any(np.asarray(lo))
    np.testing.assert_array_equal(np.asarray(resid), s)
    rows = xitd(s)
    assert rows.shape == (3, 256)
    res = meitd_jit(jnp.asarray(s))
    assert int(res.high_count) == 1 and int(res.low_count) == 1
    np.testing.assert_array_equal(np.asarray(res.residual), s)
    assert not np.any(np.asarray(res.high[0]))


def test_xitd_sorted_by_entropy():
    s = _test_signal()
    rows = xitd(s)
    assert rows.shape[1] == s.size
    from pyitd_tpu.ops.wpe import weighted_permutation_entropy as wpe

    ents = [float(wpe(rows[i], 3, normalize=True)) for i in range(rows.shape[0])]
    assert ents == sorted(ents)
    np.testing.assert_allclose(np.asarray(rows).sum(0), s, atol=1e-9)


def test_retrieve_short_circuit_matches_literal_loop():
    """The gate-constant short-circuit in retrieve_proper_rotation is
    output-identical to the literal reference loop (MEITD.py:344-368),
    on both a gate-holding and a gate-failing input and at the nex==5
    edge (loop skipped)."""
    import jax.numpy as jnp
    from pyitd_tpu.decomp.meitd import (
        _cap, _count, _extract, _wpe, retrieve_proper_rotation)

    def literal(x, wpemax):
        x = jnp.asarray(x, jnp.float64)
        cap = _cap(x.shape[-1])
        ok = bool(0.2 <= float(_wpe(x)) < wpemax)
        baseline = x
        nex = int(_count(baseline))
        if nex < 5:
            return x, 0
        while nex > 5:
            rotation, baseline = _extract(baseline, cap)
            nex = int(_count(baseline))
            if ok:
                return rotation, 1
        return x, 0

    rng = np.random.default_rng(3)
    t = np.linspace(0, 2 * np.pi, 512)
    cases = [
        np.sin(24 * t) + 0.3 * rng.normal(size=t.size),  # noisy: gate holds
        np.sin(2 * t) + 0.02 * t,                        # smooth: gate fails
        np.sin(2.6 * t),                                 # few extrema
    ]
    for x in cases:
        ref_rot, ref_flag = literal(x, 0.6)
        got_rot, got_flag = retrieve_proper_rotation(x, 0.6)
        assert got_flag == ref_flag
        np.testing.assert_array_equal(np.asarray(got_rot), np.asarray(ref_rot))
