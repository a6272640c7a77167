import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pyitd_tpu import itd_sift
from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def bank(batch=4, n=1024):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    return np.stack(
        [
            np.sin((10 + 3 * k) * t * (1 + 0.1 * t)) + 0.2 * t**2
            + 0.1 * rng.normal(size=n)
            for k in range(batch)
        ]
    )


def test_sharded_matches_single_device():
    x = bank()
    mesh = make_mesh(8, seq=4)  # 2 data x 4 seq
    rot_s, ncomp_s, reason_s, _ = sharded_itd_sift(jnp.asarray(x), mesh, 6)
    ref = itd_sift(jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(ncomp_s), np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason_s), np.asarray(ref.stop_reason))
    np.testing.assert_allclose(
        np.asarray(rot_s), np.asarray(ref.rotations), atol=1e-10
    )


def test_sharded_seq_only_mesh():
    x = bank(batch=2, n=512)
    mesh = make_mesh(8, seq=8)
    # batch=2 doesn't divide data=1... data axis is 1 here, fine
    rot_s, ncomp_s, _, _ = sharded_itd_sift(jnp.asarray(x), mesh, 4)
    ref = itd_sift(jnp.asarray(x), 4)
    np.testing.assert_allclose(np.asarray(rot_s), np.asarray(ref.rotations), atol=1e-10)


def test_sharded_reconstruction():
    x = bank(batch=2, n=2048)
    mesh = make_mesh(8, seq=4)
    rot, ncomp, _, _ = sharded_itd_sift(jnp.asarray(x), mesh, 8)
    rn = np.asarray(rot)
    for b in range(x.shape[0]):
        comps = rn[: int(ncomp[b]), b]
        np.testing.assert_allclose(comps.sum(0), x[b], atol=1e-9)


def test_sharded_compensated_reconstruction_f32():
    """The sequence-parallel sift carries the same two-sum correction
    channel as the single-chip path (decomp.itd.SiftResult.correction):
    summing the valid rotation rows in f64 and adding the correction must
    recover the f32 input exactly (the sift telescopes, so the correction
    holds every rounding residual)."""
    x = bank(batch=2, n=2048).astype(np.float32)
    mesh = make_mesh(8, seq=4)
    rot, ncomp, _, corr = sharded_itd_sift(jnp.asarray(x), mesh, 8)
    ref = itd_sift(jnp.asarray(x), 8)
    np.testing.assert_array_equal(np.asarray(corr), np.asarray(ref.correction))
    rn = np.asarray(rot, np.float64)
    cn = np.asarray(corr, np.float64)
    for b in range(x.shape[0]):
        comps = rn[: int(ncomp[b]), b]
        err = np.abs(comps.sum(0) + cn[b] - x[b].astype(np.float64)).max()
        assert err <= 1e-10, err


def test_sharded_pallas_backend_matches_xla():
    """The shard-local Pallas fill/emit path (interpret mode off-TPU) is
    bit-identical to the sharded XLA fills and to the single-chip sift."""
    x = bank(batch=2, n=1024).astype(np.float32)
    mesh = make_mesh(8, seq=4)
    rot_p, ncomp_p, reason_p, corr_p = sharded_itd_sift(
        jnp.asarray(x), mesh, 6, backend="pallas")
    ref = itd_sift(jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(ncomp_p),
                                  np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason_p),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_array_equal(np.asarray(rot_p), np.asarray(ref.rotations))
    np.testing.assert_array_equal(np.asarray(corr_p),
                                  np.asarray(ref.correction))


@pytest.mark.slow
@pytest.mark.parametrize("method", ["spike", "gather"])
def test_sharded_cubic_matches_single_device(method):
    """Both distributed solvers — the SPIKE substructuring (O(shards)
    interface collective) and the knot-gather replicated solve — match the
    single-device cubic tier."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import sharded_cubic_baseline

    x = bank(batch=2, n=1024)
    mesh = make_mesh(8, seq=4)
    rot_s, base_s, nex_s = sharded_cubic_baseline(jnp.asarray(x), mesh,
                                                  method=method)
    ref = cubic_baseline_extract(jnp.asarray(x), capacity=1026)
    np.testing.assert_array_equal(np.asarray(nex_s), np.asarray(ref.num_extrema))
    np.testing.assert_allclose(np.asarray(base_s), np.asarray(ref.baseline), atol=1e-9)
    np.testing.assert_allclose(np.asarray(rot_s), np.asarray(ref.rotation), atol=1e-9)


@pytest.mark.slow
def test_sharded_cubic_large_n_bounded_capacity():
    """At n=65536 the auto capacity must be O(#knots) per shard, not
    O(n_global) — the regression that made the knot all_gather replicate
    the whole signal (round-1 default was n_loc + 2)."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import (
        _max_knots_per_shard, sharded_cubic_baseline,
    )

    n = 65536
    t = np.linspace(0, 1, n)
    # ~40 extrema: sparse knots, so a tight capacity matters
    x = np.stack([np.sin(40 * np.pi * t) + 0.5 * t,
                  np.cos(34 * np.pi * t) - 0.3 * t])
    mesh = make_mesh(8, seq=4)
    n_loc = n // 4

    measured = int(_max_knots_per_shard(jnp.asarray(x), 4))
    assert measured <= 16, measured          # sanity: sparse as constructed
    assert measured < n_loc // 100           # the point: << O(n_loc)

    rot_s, base_s, nex_s = sharded_cubic_baseline(jnp.asarray(x), mesh)
    ref = cubic_baseline_extract(jnp.asarray(x), capacity=64)
    np.testing.assert_array_equal(np.asarray(nex_s), np.asarray(ref.num_extrema))
    np.testing.assert_allclose(np.asarray(base_s), np.asarray(ref.baseline),
                               atol=1e-9)


def test_pjit_batch_wrapper():
    from pyitd_tpu.parallel.batch import pjit_itd_sift, shard_bank
    from pyitd_tpu import itd_sift

    x = bank(batch=4, n=512)
    mesh = make_mesh(8, seq=2)  # data axis = 4
    fn = pjit_itd_sift(mesh, 5)
    rot, base, ncomp, reason = fn(shard_bank(jnp.asarray(x), mesh))
    ref = itd_sift(jnp.asarray(x), 5)
    np.testing.assert_allclose(np.asarray(rot), np.asarray(ref.rotations), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(ncomp), np.asarray(ref.num_components))


@pytest.mark.slow
def test_sharded_pallas_nan_and_budget_stop():
    """Sharded Pallas path: NaN quarantine crossing a shard boundary and
    the stop-B (budget) residual both match the single-chip sift bitwise."""
    x = bank(batch=2, n=1024).astype(np.float32)
    x[0, 511:513] = np.nan  # straddles the shard boundary at 512 (seq=4)
    mesh = make_mesh(8, seq=4)
    rot_p, ncomp_p, reason_p, corr_p = sharded_itd_sift(
        jnp.asarray(x), mesh, 2, backend="pallas")  # tiny budget -> stop B
    ref = itd_sift(jnp.asarray(x), 2)
    np.testing.assert_array_equal(np.asarray(reason_p),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_array_equal(np.asarray(rot_p), np.asarray(ref.rotations))
    np.testing.assert_array_equal(np.asarray(corr_p),
                                  np.asarray(ref.correction))


def test_sharded_xla_nan_quarantine_matches_single_device():
    """The sharded XLA fills backend applies the same NaN quarantine as
    ops.extrema.extrema_masks (samples within +-1 of a NaN are never
    extrema) — a finite sample right after a NaN must not become a knot,
    so stop decisions and rotations match the single-chip sift."""
    x = bank(batch=2, n=1024).astype(np.float32)
    x[0, 511:513] = np.nan  # straddles the shard boundary at 512 (seq=4)
    x[1, 700] = np.nan      # interior NaN with a descending neighbor
    mesh = make_mesh(8, seq=4)
    rot_s, ncomp_s, reason_s, _ = sharded_itd_sift(
        jnp.asarray(x), mesh, 6, backend="xla")
    ref = itd_sift(jnp.asarray(x), 6)
    np.testing.assert_array_equal(np.asarray(ncomp_s),
                                  np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason_s),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_allclose(np.asarray(rot_s), np.asarray(ref.rotations),
                               atol=1e-10)


@pytest.mark.parametrize("method", ["spike", "gather"])
def test_sharded_cubic_nan_quarantine(method):
    """Both distributed cubic tiers quarantine NaN neighbors like the
    single-device extrema mask, so the knot sets (hence num_extrema and
    the spline) agree on NaN-bearing inputs."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import sharded_cubic_baseline

    x = bank(batch=2, n=1024).astype(np.float32)
    x[0, 255:257] = np.nan  # straddles the shard boundary at 256 (seq=4)
    x[1, 600] = np.nan
    mesh = make_mesh(8, seq=4)
    rot_s, base_s, nex_s = sharded_cubic_baseline(jnp.asarray(x), mesh,
                                                  method=method)
    ref = cubic_baseline_extract(jnp.asarray(x), capacity=1026)
    np.testing.assert_array_equal(np.asarray(nex_s),
                                  np.asarray(ref.num_extrema))
    np.testing.assert_allclose(np.asarray(base_s), np.asarray(ref.baseline),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(rot_s), np.asarray(ref.rotation),
                               atol=1e-5)


def test_sharded_sift_collective_budget():
    """The per-trip cross-shard traffic of the Pallas sharded sift is
    exactly 2 halo ppermutes + ONE stacked fold all_gather + ONE stacked
    psum (mark count + end knots).  Today's batched forms replaced 8
    channel-wise all_gathers and 3 psums per trip; this pins the lowered
    StableHLO collective counts so an accidental unbatching (or a
    reintroduced per-channel gather) fails loudly."""
    import re
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from pyitd_tpu.parallel.sharded import _sift_local_pallas

    mesh = make_mesh(8, seq=4)
    n, batch, maxit = 1024, 4, 4
    trips = (maxit + 2) + 1  # levels + the initial extraction
    local = partial(_sift_local_pallas, axis_name="seq", n_global=n,
                    max_iteration=maxit, endpoint_mode="reference",
                    interpret=True)
    fn = shard_map(
        local, mesh=mesh, in_specs=P("data", "seq"),
        out_specs=(P(None, "data", "seq"), P("data"), P("data"),
                   P("data", "seq")),
        check_vma=False)
    x = jnp.asarray(bank(batch=batch, n=n), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    txt = jax.jit(fn).lower(xs).as_text()
    counts = {
        k: len(re.findall(rf"stablehlo\.{k}", txt))
        for k in ("all_gather", "collective_permute", "all_reduce")
    }
    assert counts == {
        "all_gather": trips,
        "collective_permute": 2 * trips,
        "all_reduce": trips,
    }, counts


def test_sharded_cubic_collective_budget():
    """Distributed-SPIKE cubic cross-shard traffic, pinned at the batched
    form's lowered counts (stacked interface gather, stacked end-moment
    psum, negation-paired pmins, arithmetic position shifts): 6
    all_gathers, 9 ppermutes, 5 all_reduces for the whole extract (the
    ownership-based end-sample psum replaced the edge all_gather —
    4 scalars reduced instead of 4 x size gathered)."""
    import re
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    from pyitd_tpu.parallel.sharded import _cubic_local_spike

    mesh = make_mesh(8, seq=4)
    local = partial(_cubic_local_spike, axis_name="seq", n_global=1024,
                    min_extrema=10)
    fn = shard_map(
        local, mesh=mesh, in_specs=P("data", "seq"),
        out_specs=(P("data", "seq"), P("data", "seq"), P("data")))
    x = jnp.asarray(bank(batch=4, n=1024), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    txt = jax.jit(fn).lower(xs).as_text()
    counts = {
        k: len(re.findall(rf"stablehlo\.{k}", txt))
        for k in ("all_gather", "collective_permute", "all_reduce")
    }
    assert counts == {"all_gather": 6, "collective_permute": 9,
                      "all_reduce": 5}, counts


@pytest.mark.slow
@pytest.mark.parametrize("n_loc", [8892, 8193, 512])
def test_sharded_fold_emit_bit_identical(n_loc):
    """The sharded fold-emit variant (per-trip block folds sourced from
    the previous trip's kernel, block-first + shard-last samples resolved
    from halos/strided slices) is bit-identical to the default sharded
    Pallas path — with multiple blocks per shard, a spike AT an interior
    block-first sample, NaN spanning a shard boundary, and all three
    shard-last-sample layouts (mid-block at n_loc=8892; exactly a
    block-first sample at n_loc=8193; a single partial block per shard
    at n_loc=512, where every block is both shard-first and shard-last)."""
    from pyitd_tpu.ops.pallas_fill import BLK

    n = 2 * n_loc
    rng = np.random.default_rng(3)
    t = np.linspace(0, 2 * np.pi, n)
    x = np.stack([
        np.sin(15 * t) + 0.1 * rng.normal(size=n),
        np.sin(5 * t * (1 + 0.2 * t)) + 0.05 * rng.normal(size=n),
    ]).astype(np.float32)
    # spike AT a block-first sample: shard 0's second block when the shard
    # has one (exercises the in-shard excluded-sample resolution), else
    # shard 1's first sample (the cross-shard halo resolution)
    x[0, BLK if n_loc > BLK else n_loc] = 8.0
    x[1, n_loc - 1 : n_loc + 2] = np.nan  # NaN across the shard boundary
    xj = jnp.asarray(x)
    mesh = make_mesh(2, seq=2)

    import os
    os.environ["PYITD_FOLD_EMIT"] = "1"
    try:
        a = sharded_itd_sift(xj, mesh, 4, backend="pallas")
    finally:
        del os.environ["PYITD_FOLD_EMIT"]
    b = sharded_itd_sift(xj, mesh, 4, backend="pallas")
    names = ("rotations", "num_components", "stop_reason", "correction")
    for ga, gb, name in zip(a, b, names):
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb),
                                      err_msg=name)


@pytest.mark.slow
def test_pjit_fused_backend_interpret_under_shard_map():
    """An explicitly-forced Pallas backend inside pjit_itd_sift must run
    (interpret mode) under shard_map off-TPU: jax's HLO interpreter slices
    kernel blocks with unvaried indices, which check_vma rejects, so the
    wrapper relaxes the check for interpret-pallas only.  Bitwise vs the
    single-chip XLA sift, with and without fold-emit."""
    import os

    from pyitd_tpu.ops.pallas_fill import BLK
    from pyitd_tpu.parallel.batch import pjit_itd_sift, shard_bank

    rng = np.random.default_rng(1)
    n = BLK + 512
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(np.sin(18 * t)[None] + 0.2 * rng.normal(size=(4, n)),
                    jnp.float32)
    mesh = make_mesh(4, seq=1)
    ref = itd_sift(x, 3, backend="xla", store_baselines=False)
    for fold in (False, True):
        if fold:
            os.environ["PYITD_FOLD_EMIT"] = "1"
        try:
            fb = pjit_itd_sift(mesh, 3, store_baselines=False,
                               backend="pallas_fused")
            rot, _base, ncomp, reason = fb(shard_bank(x, mesh))
        finally:
            os.environ.pop("PYITD_FOLD_EMIT", None)
        np.testing.assert_array_equal(np.asarray(rot),
                                      np.asarray(ref.rotations))
        np.testing.assert_array_equal(np.asarray(ncomp),
                                      np.asarray(ref.num_components))


def test_sharded_any_length():
    """VERDICT r3 item 5: seq no longer needs to divide n — the time axis
    is edge-padded and cropped, with pad samples excluded from
    extrema/knots by global-position masks."""
    x = bank(batch=2, n=1003)
    mesh = make_mesh(8, seq=4)
    rot, ncomp, reason, corr = sharded_itd_sift(jnp.asarray(x), mesh, 6)
    ref = itd_sift(jnp.asarray(x), 6)
    assert rot.shape[-1] == 1003 and corr.shape[-1] == 1003
    np.testing.assert_array_equal(np.asarray(ncomp),
                                  np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_allclose(np.asarray(rot), np.asarray(ref.rotations),
                               atol=1e-10)


def test_sharded_any_length_pallas():
    x = bank(batch=2, n=775).astype(np.float32)
    mesh = make_mesh(8, seq=4)
    rot, ncomp, reason, corr = sharded_itd_sift(
        jnp.asarray(x), mesh, 5, backend="pallas")
    ref = itd_sift(jnp.asarray(x), 5)
    np.testing.assert_array_equal(np.asarray(ncomp),
                                  np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_array_equal(np.asarray(rot), np.asarray(ref.rotations))
    np.testing.assert_array_equal(np.asarray(corr),
                                  np.asarray(ref.correction))


@pytest.mark.slow
def test_sharded_f32_beyond_position_ceiling():
    """VERDICT r3 item 2 (lift): above 2^24 samples the auto backend
    falls back to the XLA fills, whose knot positions ride as i32 bit
    patterns — exact at any n.  Checked against the f64 single-chip
    oracle on a >2^24 signal."""
    n = (1 << 24) + 4096
    t = np.linspace(0, 40 * np.pi, n)
    x = (np.sin(t) + 0.3 * np.sin(7.3 * t)).astype(np.float32)[None]
    mesh = make_mesh(8, seq=8)
    rot, ncomp, reason, _ = sharded_itd_sift(jnp.asarray(x), mesh, 1)
    # oracle: the single-chip f32 sift through the integer-indexed gather
    # backend — exact positions AND the same f32 value arithmetic (an f64
    # oracle shifts plateau extrema at later levels: legitimate
    # cross-precision chaos, not a position defect)
    ref = itd_sift(jnp.asarray(x), 1, backend="xla",
                   linear_backend="gather")
    np.testing.assert_array_equal(np.asarray(ncomp),
                                  np.asarray(ref.num_components))
    np.testing.assert_array_equal(np.asarray(reason),
                                  np.asarray(ref.stop_reason))
    np.testing.assert_allclose(np.asarray(rot),
                               np.asarray(ref.rotations), atol=1e-10)


def test_sharded_any_batch():
    """The 'data' axis also accepts any size: zero-row padding, cropped."""
    x = bank(batch=3, n=512)
    mesh = make_mesh(8, seq=4)  # data=2 does not divide batch=3
    rot, ncomp, reason, corr = sharded_itd_sift(jnp.asarray(x), mesh, 5)
    ref = itd_sift(jnp.asarray(x), 5)
    assert rot.shape[1] == 3 and ncomp.shape == (3,)
    np.testing.assert_array_equal(np.asarray(ncomp),
                                  np.asarray(ref.num_components))
    np.testing.assert_allclose(np.asarray(rot), np.asarray(ref.rotations),
                               atol=1e-10)


@pytest.mark.slow
def test_sharded_cubic_beyond_ceiling():
    """The sharded cubic tier has no position ceiling: knot positions are
    integers end to end (i32 compact buffers / bit-pattern fills; spans
    difference before casting).  Pinned at n > 2^24 against the
    single-chip f32 gather oracle (same f32 value arithmetic, exact
    positions on both sides)."""
    from scipy.signal import sawtooth

    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import sharded_cubic_baseline

    n = (1 << 24) + 4096
    t = np.linspace(0, 60 * np.pi, n)
    # triangle waves: SHARP extrema (slope O(1) per span), so the f32
    # quantization of a smooth signal — plateaus near extrema that
    # dither into thousands of spurious 1-sample-apart knots, whose
    # not-a-knot end-moment extrapolation amplifies f32 noise by ~1e9 —
    # cannot occur; this test is about POSITIONS, not conditioning
    x = (sawtooth(t, 0.5) + 0.4 * sawtooth(5.1 * t + 1.0, 0.5)
         ).astype(np.float32)[None]
    mesh = make_mesh(8, seq=8)
    ref = cubic_baseline_extract(jnp.asarray(x), capacity=1024,
                                 min_extrema=0, eval_backend="gather")
    scale = float(np.max(np.abs(np.asarray(ref.baseline))))
    for method in ("spike", "gather"):
        rot, base, nex = sharded_cubic_baseline(
            jnp.asarray(x), mesh, method=method, min_extrema=0)
        np.testing.assert_array_equal(np.asarray(nex),
                                      np.asarray(ref.num_extrema))
        np.testing.assert_allclose(np.asarray(base),
                                   np.asarray(ref.baseline),
                                   atol=3e-5 * max(scale, 1.0),
                                   err_msg=method)


@pytest.mark.parametrize("method", ["spike", "gather"])
def test_sharded_cubic_any_shape(method):
    """The cubic tier shares the sift's padding contract: any length
    (edge-pad + gpos masks) and any batch (zero rows), cropped."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import sharded_cubic_baseline

    x = bank(batch=3, n=1013)
    mesh = make_mesh(8, seq=4)
    ref = cubic_baseline_extract(jnp.asarray(x), capacity=1015)
    rot, base, nex = sharded_cubic_baseline(jnp.asarray(x), mesh,
                                            method=method)
    assert base.shape == (3, 1013)
    np.testing.assert_array_equal(np.asarray(nex),
                                  np.asarray(ref.num_extrema))
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref.baseline),
                               atol=1e-9)


# ---------------------------------------------------------------------------
# differentiation contract (VERDICT r4 item 3): the sharded sift is
# first-class under AD on every backend — the XLA fills differentiate
# directly (collectives transpose), and the Pallas backend carries a custom
# VJP recomputing the backward through the XLA sharded fills.
# ---------------------------------------------------------------------------


def test_sharded_grad_matches_single_chip():
    """grad of the sharded sift on the virtual mesh vs the single-chip
    structural grad: VERDICT r4 asked for 1e-6 agreement and a test that
    keeps the (previously unprotected) passing state pinned."""
    x = bank(batch=2, n=512)  # f64: the XLA route keeps the input dtype
    mesh = make_mesh(8, seq=4)

    def loss_sharded(a):
        rot, _, _, _ = sharded_itd_sift(a, mesh, 4, backend="xla")
        return jnp.sum(jnp.square(rot))

    def loss_single(a):
        return jnp.sum(jnp.square(
            itd_sift(a, 4, store_baselines=False).rotations))

    g_s = np.asarray(jax.grad(loss_sharded)(jnp.asarray(x)))
    g_1 = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
    assert np.all(np.isfinite(g_s))
    np.testing.assert_allclose(g_s, g_1, atol=1e-9)


def test_sharded_grad_pallas_backend_no_crash():
    """The Pallas sharded backend must not crash under jax.grad (its
    kernels have no AD rules; the custom VJP reroutes the backward
    through the XLA sharded fills).  Interpret-mode forward on CPU."""
    x = bank(batch=2, n=512).astype(np.float32)
    mesh = make_mesh(8, seq=4)

    def loss(a):
        rot, _, _, corr = sharded_itd_sift(a, mesh, 4, backend="pallas")
        return jnp.sum(jnp.square(rot)) + jnp.sum(corr)

    def loss_xla(a):
        rot, _, _, corr = sharded_itd_sift(a, mesh, 4, backend="xla")
        return jnp.sum(jnp.square(rot)) + jnp.sum(corr)

    g_p = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    g_x = np.asarray(jax.grad(loss_xla)(jnp.asarray(x)))
    assert np.all(np.isfinite(g_p))
    # identical backward path; forwards agree bitwise (pinned elsewhere),
    # so the cotangents match to f32 roundoff
    np.testing.assert_allclose(g_p, g_x, atol=1e-5)


def test_sharded_cubic_grad_works():
    """The sequence-parallel cubic tier (pure XLA: SPIKE factors +
    collectives) differentiates directly; pin against the single-chip
    gather-backend AD."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
    from pyitd_tpu.parallel.sharded import sharded_cubic_baseline

    x = bank(batch=2, n=256)
    mesh = make_mesh(8, seq=4)

    def loss_sharded(a):
        rot, base, _ = sharded_cubic_baseline(a, mesh, min_extrema=0)
        return jnp.sum(jnp.square(rot)) + jnp.sum(jnp.sin(base))

    def loss_single(a):
        r = cubic_baseline_extract(a, a.shape[-1] + 2, min_extrema=0,
                                   eval_backend="gather")
        return jnp.sum(jnp.square(r.rotation)) + jnp.sum(jnp.sin(r.baseline))

    g_s = np.asarray(jax.grad(loss_sharded)(jnp.asarray(x)))
    g_1 = np.asarray(jax.grad(loss_single)(jnp.asarray(x)))
    assert np.all(np.isfinite(g_s))
    np.testing.assert_allclose(g_s, g_1, atol=1e-9)
