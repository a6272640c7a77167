"""The f32 knot-position ceiling must refuse loudly, never aliasing.

Every fast path carries knot positions in f32 channels (exact only to
2^24); past that, distinct positions collide and knots silently corrupt.
VERDICT round 3 flagged the absence of any guard as the one place the
framework could return wrong numbers without warning.  These tests pin
the guards; the f64 routes stay open (exact to 2^53).
"""
import jax
import jax.numpy as jnp
import pytest

from pyitd_tpu import itd_sift
from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract
from pyitd_tpu.ops.linear_baseline import linear_baseline_extract
from pyitd_tpu.parallel.sharded import (make_mesh, sharded_cubic_baseline,
                                        sharded_itd_sift)

N_BIG = (1 << 24) + 8  # first guarded length, seq=8-divisible


def _spec(n, dtype):
    return jax.ShapeDtypeStruct((n,), dtype)


def test_itd_sift_f32_over_ceiling():
    # round 5: the Pallas kernels now switch to i32 bit-pattern position
    # channels above 2^24 (exact to POS_BITS_MAX_N) — the sift TRACES
    # there instead of refusing.  The XLA route still delegates to the
    # per-level guard, which rejects f32 'scan' fills but keeps the
    # integer-indexed 'gather' route open (exact at any n).
    res = jax.eval_shape(lambda a: itd_sift(a, 2, backend="pallas_fused"),
                         _spec(N_BIG, jnp.float32))
    assert res.rotations.shape == (4, N_BIG)
    with pytest.raises(ValueError, match="f32 knot-position ceiling"):
        jax.eval_shape(
            lambda a: itd_sift(a, 4, backend="xla", linear_backend="scan"),
            _spec(N_BIG, jnp.float32))
    res = jax.eval_shape(
        lambda a: itd_sift(a, 2, backend="xla", linear_backend="gather"),
        _spec(N_BIG, jnp.float32))
    assert res.rotations.shape == (4, N_BIG)
    # the encoding's own ceiling still refuses loudly
    from pyitd_tpu.ops.pallas_fill import POS_BITS_MAX_N

    with pytest.raises(ValueError, match="bit-pattern position ceiling"):
        jax.eval_shape(lambda a: itd_sift(a, 2, backend="pallas_fused"),
                       _spec(POS_BITS_MAX_N + 8, jnp.float32))


def test_itd_sift_f64_over_ceiling_traces():
    res = jax.eval_shape(
        lambda a: itd_sift(a, 2, backend="xla"), _spec(N_BIG, jnp.float64)
    )
    assert res.rotations.shape == (4, N_BIG)


def test_itd_sift_f32_at_ceiling_traces():
    # n == 2^24 is still exact (positions reach 2^24 - 1)
    res = jax.eval_shape(
        lambda a: itd_sift(a, 2, backend="xla"), _spec(1 << 24, jnp.float32)
    )
    assert res.rotations.shape == (4, 1 << 24)


def test_linear_baseline_backends():
    spec32 = _spec(N_BIG, jnp.float32)
    with pytest.raises(ValueError, match="f32 knot-position ceiling"):
        jax.eval_shape(
            lambda a: linear_baseline_extract(a, backend="scan"), spec32
        )
    # pallas switches to bit-pattern positions above 2^24 (traces);
    # integer-indexed gather stays open at any n, f64 scan too
    jax.eval_shape(
        lambda a: linear_baseline_extract(a, backend="pallas"), spec32)
    jax.eval_shape(
        lambda a: linear_baseline_extract(a, backend="gather"), spec32)
    jax.eval_shape(
        lambda a: linear_baseline_extract(a, backend="scan"),
        _spec(N_BIG, jnp.float64))


def test_cubic_backends():
    spec32 = _spec(N_BIG, jnp.float32)
    spec64 = _spec(N_BIG, jnp.float64)
    with pytest.raises(ValueError, match="f32 knot-position ceiling"):
        jax.eval_shape(
            lambda a: cubic_baseline_extract(a, 64, eval_backend="scan"),
            spec32)
    with pytest.raises(ValueError, match="f32 knot-position ceiling"):
        # the fills backends compute in f32 regardless of input dtype
        jax.eval_shape(
            lambda a: cubic_baseline_extract(a, 64, eval_backend="fills"),
            spec64)
    # the gather backend keeps positions integer end to end: open at any
    # n for BOTH dtypes
    jax.eval_shape(
        lambda a: cubic_baseline_extract(a, 64, eval_backend="gather"),
        spec32)
    jax.eval_shape(
        lambda a: cubic_baseline_extract(a, 64, eval_backend="gather"),
        spec64)


def test_sharded_entry_points():
    mesh = make_mesh(8, seq=8)
    x32 = jnp.zeros((1, N_BIG), jnp.float32)
    # the sharded sift LIFTS the ceiling: auto falls back to the exact
    # i32-position XLA fills (covered end-to-end by
    # tests/test_sharded.py::test_sharded_f32_beyond_position_ceiling);
    # only an explicitly requested Pallas backend refuses.  The sharded
    # cubic tier has no ceiling at all (integer positions end to end;
    # covered by test_sharded.py::test_sharded_cubic_beyond_ceiling).
    with pytest.raises(ValueError, match="f32 knot-position ceiling"):
        sharded_itd_sift(x32, mesh, 2, backend="pallas")
