import numpy as np
import jax.numpy as jnp

from pyitd_tpu.decomp.aft import accumulator_dft, unique_twiddle_count


def test_unique_twiddles_512():
    assert unique_twiddle_count(512) == 257  # the notebook's count


def test_accumulator_dft_matches_fft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=128)
    got = np.asarray(accumulator_dft(jnp.asarray(x)))
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_accumulation_paths_structure():
    """Cell 8 semantics: harmonic chains and shared-symbol sets."""
    from pyitd_tpu.decomp.aft import accumulation_paths

    paths = accumulation_paths(64)
    assert paths[0]["harmonics"] == []
    assert paths[3]["harmonics"] == [6, 9, 12, 15, 18, 21, 24, 27, 30, 33,
                                     36, 39, 42, 45, 48, 51, 54, 57, 60, 63]
    # harmonically related bins share coefficients (the notebook's claim)
    assert len(paths[3]["shared_symbols"][6]) > 0
    for h, shared in paths[3]["shared_symbols"].items():
        assert shared <= paths[3]["symbols"]


def test_sub_accumulators_share_across_bins():
    """The hierarchy only pays off if accumulators are reused across bin
    rows: the total accumulator count must be well below the naive
    one-per-(row, symbol) count."""
    from pyitd_tpu.decomp.aft import sub_accumulators

    n = 64
    acc_members, row_acc = sub_accumulators(n)
    per_row = sum(len(ids) for ids in row_acc.values())
    assert len(acc_members) < 0.7 * per_row  # genuine cross-bin sharing
    # every row decomposes into accumulators covering all n positions once
    for r in (0, 1, 5, n, 2 * n - 1):
        positions = [p for a in row_acc[r] for p in acc_members[a][1]]
        assert sorted(positions) == list(range(n))


def test_hierarchical_dft_matches_fft_and_flat():
    from pyitd_tpu.decomp.aft import accumulator_dft, hierarchical_dft

    rng = np.random.default_rng(0)
    x = rng.random(64) + 6 * np.sin(np.linspace(0, 50 * np.pi, 64))
    want = np.fft.fft(x)
    got = np.asarray(hierarchical_dft(x))
    np.testing.assert_allclose(got, want, atol=5e-4)
    flat = np.asarray(accumulator_dft(x))
    np.testing.assert_allclose(got, flat, atol=5e-4)

    # batched
    xb = rng.random((3, 64))
    np.testing.assert_allclose(
        np.asarray(hierarchical_dft(xb)), np.fft.fft(xb, axis=-1), atol=5e-4
    )
