"""Opt-in on-chip parity gates.

The regular suite forces a virtual 8-device CPU mesh (conftest.py) because
every tiny compile over the remote TPU relay takes seconds-to-minutes.
These tests instead validate the REAL-chip lowerings — the Mosaic kernel
paths that interpret-mode CI structurally cannot exercise (ADVICE r2 item
4: the on-chip SPIKE solve; plus the fused/emit sift Mosaic modules and
the compensated-reconstruction contract).  Run with the stock session
environment:

    PYITD_ONCHIP_TESTS=1 python -m pytest tests/test_onchip.py -q

Skipped everywhere else.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    os.environ.get("PYITD_ONCHIP_TESTS") != "1"
    or jax.default_backend() != "tpu",
    reason="on-chip parity gates need PYITD_ONCHIP_TESTS=1 and an attached "
    "TPU backend",
)


def _sig(rows, n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n)
    return jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None])) + np.sin(13 * t[None])
        + 0.3 * rng.normal(size=(rows, n)) + t[None] ** 2 * 0.1,
        jnp.float32,
    )


def test_fused_sift_matches_xla_onchip():
    """The one-kernel fused level's Mosaic lowering is bit-identical to
    the portable XLA carry loop on the real chip (the CPU suite pins this
    in interpret mode only)."""
    from pyitd_tpu import itd_sift

    x = _sig(2, 16384)
    a = itd_sift(x, 6, backend="pallas_fused", store_baselines=False)
    b = itd_sift(x, 6, backend="xla", store_baselines=False)
    assert bool(jnp.all(a.rotations == b.rotations))
    assert bool(jnp.all(a.correction == b.correction))
    assert bool(jnp.all(a.num_components == b.num_components))
    assert bool(jnp.all(a.stop_reason == b.stop_reason))


def test_emit_sift_matches_fused_onchip():
    """Two-kernel emit path == fused path on the real chip."""
    from pyitd_tpu import itd_sift

    x = _sig(2, 16384, seed=1)
    a = itd_sift(x, 6, backend="pallas_emit", store_baselines=False)
    b = itd_sift(x, 6, backend="pallas_fused", store_baselines=False)
    assert bool(jnp.all(a.rotations == b.rotations))
    assert bool(jnp.all(a.correction == b.correction))


def test_spike_cubic_onchip():
    """The on-chip SPIKE moment solve (fills backend) agrees with the
    compact-PCR route (fills_compact) on real hardware — the CI-side
    SPIKE tests run interpret mode only (ADVICE r2 item 4)."""
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract

    x = _sig(2, 32768, seed=3)
    cap = x.shape[-1] + 2
    a = cubic_baseline_extract(x, cap, min_extrema=0, eval_backend="fills")
    b = cubic_baseline_extract(x, cap, min_extrema=0,
                               eval_backend="fills_compact")
    scale = float(jnp.max(jnp.abs(a.baseline))) + 1e-30
    rel = float(jnp.max(jnp.abs(a.baseline - b.baseline))) / scale
    assert rel < 5e-5, rel


def test_sharded_sift_matches_plain_onchip():
    """The sequence-parallel reverse-walk kernel (1x1 mesh, real Mosaic
    lowering) is bit-identical to the plain fused sift on the chip — the
    CI-side sharded parity runs interpret mode on the virtual CPU mesh
    only."""
    from pyitd_tpu import itd_sift
    from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift

    x = _sig(2, 16384, seed=7)
    mesh = make_mesh(1, seq=1)
    rot, ncomp, reason, corr = sharded_itd_sift(x, mesh, 6)
    b = itd_sift(x, 6, store_baselines=False)
    assert bool(jnp.all(rot == b.rotations))
    assert bool(jnp.all(corr == b.correction))
    assert bool(jnp.all(ncomp == b.num_components))
    assert bool(jnp.all(reason == b.stop_reason))


def test_compensated_reconstruction_onchip():
    """sum(rotations) + Neumaier residual + sift correction reconstructs
    the input to ~0 at f32 on the real chip (the round-2/3 precision
    contract; /root/reference/ITD.py:505-508 is the oracle)."""
    from pyitd_tpu import itd_sift
    from pyitd_tpu.utils.summation import neumaier_sum_parts

    x = _sig(2, 65536, seed=5)
    res = itd_sift(x, 8, store_baselines=False)
    s, c = neumaier_sum_parts(res.rotations, axis=0)
    ec = float(jnp.max(jnp.abs((s - x) + (c + res.correction))))
    assert ec <= 1e-10, ec


def test_fold_emit_matches_default_onchip():
    """The fold-emit Mosaic lowerings (single-chip and sharded: the
    in-kernel partial-fold reductions + the XLA resolvers) are bitwise
    the default paths on the real chip — the CI-side parity runs
    interpret mode only."""
    from pyitd_tpu.decomp.itd import _itd_sift_fused
    from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift

    x = _sig(2, 16384, seed=11)
    a = _itd_sift_fused(x, 6, "reference", False, fold_emit=True)
    b = _itd_sift_fused(x, 6, "reference", False, fold_emit=False)
    assert bool(jnp.all(a.rotations == b.rotations))
    assert bool(jnp.all(a.correction == b.correction))
    assert bool(jnp.all(a.num_components == b.num_components))

    mesh = make_mesh(1, seq=1)
    os.environ["PYITD_FOLD_EMIT"] = "1"
    try:
        sa = sharded_itd_sift(x, mesh, 6)
    finally:
        del os.environ["PYITD_FOLD_EMIT"]
    sb = sharded_itd_sift(x, mesh, 6)
    for ga, gb in zip(sa, sb):
        assert bool(jnp.all(ga == gb))
