"""Canonical ITD sift — level-by-level proper-rotation extraction.

Behavioral contract (from ``/root/reference/ITD.py:351-433``):

* pre-extract ``(R, B) = baseline_extract(x)``; then per level, count the
  extrema of the current baseline;
* **stop A** (``num_extrema < 2``): the residual row is the *previously
  stored baseline* (the input of the most recent extraction) and the
  rotation/baseline of that extraction are discarded (``ITD.py:404-416``);
  if the very first baseline is already flat, the reference reads
  ``baselines[-1]`` of an all-zeros container, so the output is one zero
  row — preserved here;
* **stop B** (``counter > max_iteration``): the residual row is
  ``rotation + baseline`` (``ITD.py:418-426``) — numerically the same
  signal as stop A's residual up to f64 roundoff;
* otherwise store the rotation, descend into the baseline.

TPU-first design: the loop is a ``lax.fori_loop`` with a **static trip
count** of ``max_iteration + 2`` (the maximum number of output rows), so the
whole sift jits once, vmaps over signal banks, and shards.  Each trip writes
output row *i* (the trip index — equal to the live level counter while the
sift is running) with a ``where``-selected payload: rotation / residual /
zeros.  No dynamic shapes anywhere; per-batch-element early stopping is a
boolean carry, not control flow.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

# two_sum_err: the shared Knuth two-sum residual; valid for arbitrary
# a, b — XLA does not reassociate floating point by default, so the
# cancellation pattern survives compilation
from ..ops.linear_baseline import linear_baseline_extract
from ..ops.linear_baseline import two_sum_err as _two_sum_err

__all__ = ["itd_sift", "SiftResult", "ITD", "STOP_RUNNING", "STOP_FLAT", "STOP_BUDGET"]

STOP_RUNNING = 0  # never appears in outputs
STOP_FLAT = 1     # stop A: baseline has < 2 extrema
STOP_BUDGET = 2   # stop B: level budget exhausted


def _force_pos_bits() -> bool:
    """Test hook: force the i32 bit-pattern position channels at any n
    (tests pin bitwise parity against value mode at small n, so the
    any-n encoding stays suite-protected without 16M-sample runs)."""
    import os as _os

    return bool(_os.environ.get("PYITD_FORCE_POS_BITS"))


class SiftResult(NamedTuple):
    """Fixed-shape sift output.

    ``rotations``/``baselines`` carry the level axis first:
    ``(levels, *batch, n)``.  ``num_components`` rows of ``rotations`` are
    valid (the last valid row is the residual trend); rows beyond are zero.

    ``correction`` is the compensated-reconstruction term (SURVEY.md §7
    hard-part f): the sift telescopes (each rotation is a stored-value
    difference), so the only reconstruction error is the rounding of those
    per-level subtractions.  Each level's exact rounding residual (Knuth
    two-sum) is accumulated here, making
    ``sum(rotations[:num_components]) + correction == x`` exact to the
    roundoff of the *correction itself* (~1e-13 for f32 O(1) signals —
    well under the reference's 1e-10 bar, ``/root/reference/ITD.py:505-508``)
    without leaving the fast f32 path.  Add it to the residual row (or keep
    it as an extra component) when bit-faithful reconstruction matters.
    """

    rotations: jax.Array
    baselines: jax.Array
    num_components: jax.Array  # int32, per batch element
    stop_reason: jax.Array     # int32, STOP_FLAT or STOP_BUDGET
    correction: jax.Array      # (*batch, n), same dtype as x



@partial(jax.jit, static_argnames=(
    "max_iteration", "endpoint_mode", "store_baselines", "backend",
    "early_exit", "linear_backend"))
def itd_sift(
    x: jax.Array,
    max_iteration: int = 11,
    *,
    endpoint_mode: str = "reference",
    store_baselines: bool = True,
    backend: str = "auto",
    early_exit: bool = False,
    linear_backend: str = "auto",
) -> SiftResult:
    """Full canonical sift of ``x`` (last axis = time; leading axes = batch).

    ``backend``:

    * "auto" — "pallas_fused" on TPU for large f32 inputs, "xla" elsewhere;
    * "pallas_fused" — ONE reverse-walking kernel per level (the reverse
      scan chains its suffix through an SMEM carry, the forward scan is
      seeded from an XLA per-block fold, epilogue and sift bookkeeping
      run in-register; the forward fill channels never touch HBM).
      Fastest; the big Mosaic module compiles slowly cold;
    * "pallas_emit" — the two-kernel level (forward fill with SMEM carry
      + fused reverse/emit kernel).  ~20% slower, compiles fast;
    * "xla" — the portable carry loop (every backend, every dtype).

    All backends are bit-identical (pinned in tests).  The Pallas paths
    are differentiable: their kernels have no JVP rule, so a custom VJP
    recomputes the backward pass through the XLA loop (numerically
    matching; costs one extra XLA-path forward on grad).  ``early_exit``
    (emit path only) opts into a while_loop that skips trips once every
    batch row has stopped; under ``backend="auto"`` it selects the emit
    path, and combining it with an explicit ``backend="pallas_fused"``
    raises (the fused unrolled loop has no early exit).
    """
    if backend == "pallas_fused" and early_exit:
        raise ValueError(
            "early_exit is not supported by the fused (unrolled) backend; "
            "use backend='pallas_emit' (or 'auto') with early_exit"
        )
    if backend == "auto":
        on_tpu = (
            jax.default_backend() == "tpu"
            and x.dtype == jnp.float32
            and x.shape[-1] >= 4096
        )
        backend = ("pallas_emit" if early_exit else "pallas_fused") \
            if on_tpu else "xla"
    if backend in ("pallas_emit", "pallas_fused"):
        use_emit, fused = True, backend == "pallas_fused"
    elif backend == "xla":
        use_emit = False
    else:
        raise ValueError(f"unknown backend: {backend!r}")
    # Position exactness (docs/PLATFORM.md, docs/NUMERICS.md): below 2^24
    # samples the Pallas kernels carry knot positions as plain f32 values;
    # above, they switch to i32 bit-pattern position channels (the sharded
    # path's encoding ported in round 5 — ops/pallas_fill.py `_enc_pos`),
    # exact to POS_BITS_MAX_N (~2^31, beyond single-chip HBM).  The guard
    # below is therefore only the encoding's own ceiling.
    if use_emit and x.dtype == jnp.float32:
        from ..ops.pallas_fill import POS_BITS_MAX_N

        if x.shape[-1] > POS_BITS_MAX_N:
            raise ValueError(
                f"n={x.shape[-1]} exceeds the bit-pattern position ceiling "
                f"({POS_BITS_MAX_N}) of the Pallas sift kernels. Use "
                "backend='xla' with linear_backend='gather' (exact integer "
                "positions at any n), cast the input to float64, or shard "
                "the time axis (parallel.sharded.sharded_itd_sift)."
            )
    if use_emit:
        if x.dtype != jnp.float32:
            raise ValueError(
                "the pallas_emit sift backend is f32-only; cast the input "
                "or use backend='xla' to keep the input dtype"
            )

        def emit_fn(xx):
            return _itd_sift_emit(xx, max_iteration, endpoint_mode,
                                  store_baselines, early_exit, fused=fused)

        def xla_fn(xx):
            # 'structural': each level carries the hand-written adjoint
            # (ops.linear_baseline.linear_baseline_extract_structural) —
            # the level forward may run the Pallas kernels (never
            # differentiated) and the backward is closed-form segment
            # sums + knot scatter-adds.  AD-of-the-scan-fills with
            # per-level remat measured 66x the fused forward at 8x1M.
            return _itd_sift_xla(xx, max_iteration, endpoint_mode,
                                 store_baselines,
                                 linear_backend="structural")

        f = jax.custom_vjp(emit_fn)

        def fwd(xx):
            return emit_fn(xx), xx

        def bwd(xx, g):
            return (jax.vjp(xla_fn, xx)[1](g)[0],)

        f.defvjp(fwd, bwd)
        return f(x)
    return _itd_sift_xla(x, max_iteration, endpoint_mode, store_baselines,
                         linear_backend=linear_backend)


def _itd_sift_xla(x, max_iteration, endpoint_mode, store_baselines,
                  remat_level=False, linear_backend="auto"):
    """Portable XLA carry-loop sift (every backend, every dtype,
    reverse-mode differentiable).  ``remat_level`` checkpoints each
    level's extraction so reverse-mode saves only the level inputs."""
    levels = max_iteration + 2
    if linear_backend == "structural":
        from ..ops.linear_baseline import linear_baseline_extract_structural

        extract = partial(linear_baseline_extract_structural,
                          endpoint_mode=endpoint_mode)
    else:
        extract = partial(linear_baseline_extract,
                          endpoint_mode=endpoint_mode,
                          backend=linear_backend)
    if remat_level:
        extract = jax.checkpoint(extract)

    first = extract(x)
    rotation, baseline = first.rotation, first.baseline
    # pending_err: exact rounding residual of the not-yet-emitted rotation
    # (rotation = fl(input - baseline); err = (input - baseline) - rotation)
    pending_err = first.sub_err
    # derive every constant carry from x so it inherits x's varying-mesh
    # axes — under shard_map (e.g. parallel.batch.pjit_itd_sift) plain
    # zeros would type-mismatch the loop body's varying outputs
    zero = x * 0
    out_rot = jnp.zeros((levels,) + x.shape, dtype=x.dtype) + zero
    base_levels = levels if store_baselines else 1
    out_base = jnp.zeros((base_levels,) + x.shape, dtype=x.dtype) + zero

    izero = zero[..., 0].astype(jnp.int32)
    done = izero != 0
    reason = izero
    ncomp = izero
    prev_base = zero  # mirrors the reference's zero-filled container read
    comp = zero       # accumulated correction (see SiftResult.correction)

    def body(i, carry):
        (rotation, baseline, prev_base, out_rot, out_base, done, reason,
         ncomp, pending_err, comp) = carry
        # one extraction per trip: its extrema count drives the stop
        # decision for the *current* baseline, and its outputs become the
        # next level's carries (the pallas backend emits count, rotation,
        # and rounding residual from the kernels directly)
        new = extract(baseline)
        nex = new.num_extrema

        stop_a = (~done) & (nex < 2)
        # PLATFORM-WA(strict-gt): budget checks use >= forms, never
        # integer strict > inside lax loops (docs/PLATFORM.md)
        stop_b = (~done) & (~stop_a) & (i >= max_iteration + 1)
        cont = (~done) & (~stop_a) & (~stop_b)
        stopping = stop_a | stop_b

        res_sum = rotation + baseline
        residual = jnp.where(stop_a[..., None], prev_base, res_sum)
        row = jnp.where(
            stopping[..., None],
            residual,
            jnp.where(cont[..., None], rotation, jnp.zeros_like(rotation)),
        )
        out_rot = out_rot.at[i].set(row)
        if store_baselines:
            base_row = jnp.where(cont[..., None], baseline, jnp.zeros_like(baseline))
            out_base = out_base.at[i].set(base_row)

        # compensation: the pending rotation's subtraction error enters the
        # output when the rotation is emitted (cont) or folded into the
        # stop-B residual; stop A discards the pending extraction entirely.
        # Stop B's residual addition rounds once more (res_err).
        res_err = _two_sum_err(rotation, baseline, res_sum)
        emit = (cont | stop_b)[..., None]
        comp = comp + jnp.where(emit, pending_err, 0.0) + jnp.where(
            stop_b[..., None], res_err, 0.0
        )

        # Unconditional carry updates: once an element stops, its carries
        # are never read again (rows are zero-gated by `cont`/`stopping`
        # above, and the residual reads the carries exactly at the stop
        # trip, before this update) — so freezing them with per-element
        # selects would only add 4 full-array select passes per level.
        rotation = new.rotation
        pending_err = new.sub_err
        prev_base = baseline
        baseline = new.baseline

        ncomp = jnp.where(stopping, i + 1, ncomp)
        reason = jnp.where(
            stop_a, STOP_FLAT, jnp.where(stop_b, STOP_BUDGET, reason)
        )
        done = done | stopping
        return (rotation, baseline, prev_base, out_rot, out_base, done,
                reason, ncomp, pending_err, comp)

    carry = (rotation, baseline, prev_base, out_rot, out_base, done, reason,
             ncomp, pending_err, comp)
    carry = lax.fori_loop(0, levels, body, carry)
    out_rot, out_base, reason, ncomp, comp = (
        carry[3], carry[4], carry[6], carry[7], carry[9]
    )
    return SiftResult(
        rotations=out_rot,
        baselines=out_base,
        num_components=ncomp,
        stop_reason=reason,
        correction=comp,
    )


def _itd_sift_emit(x, max_iteration, endpoint_mode, store_baselines,
                   early_exit=False, fused=False, position_encoding=None):
    """TPU fast path: identical loop semantics to the XLA body above, but
    each trip is one fused Pallas level (``sift_level_emit_padded``) that
    also materializes the output row and compensation update in-register,
    and every big array stays in the kernels' padded 3-D layout across
    trips — the XLA row/residual/compensation selects, the extrema-count
    reduction, and the per-trip pad/crop/edge-slice copies together cost
    ~1.7 ms per trip at 8x1M on v5e.  ``fused=True`` delegates to the
    one-kernel-per-trip form (``itd_sift`` rejects fused + early_exit)."""
    if fused:
        return _itd_sift_fused(x, max_iteration, endpoint_mode,
                               store_baselines,
                               position_encoding=position_encoding)
    from functools import partial as _partial

    from ..ops.pallas_fill import _pad_edges
    from ..ops.pallas_fill import sift_level_emit_padded as _emit_padded

    levels = max_iteration + 2
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    rows = x2.shape[0]
    interp = jax.default_backend() != "tpu"
    # i32 bit-pattern position channels above the f32 value ceiling (or
    # forced for parity tests) — see ops/pallas_fill.py `_enc_pos`
    if position_encoding is None:
        encode = n > (1 << 24) or _force_pos_bits()
    else:
        encode = position_encoding == "bits"
    sift_level_emit_padded = _partial(_emit_padded, encode=encode)

    x3, pe, ne, npad, nblk = _pad_edges(x2)
    bf = 0.5 * (x2[:, 0] + x2[:, 1])
    bl = 0.5 * (x2[:, n - 2] + x2[:, n - 1])
    zero3 = x3 * 0  # derived from x3: inherits varying-mesh axes
    fdone = (x3[:, 0, 0] * 0) == 0  # all flags off -> pure extraction

    # initial extraction (the pre-loop extract of the XLA path): flags all
    # false, so the row/compensation outputs are inert
    (base3, rot3, err3, _row, _comp, _nex, _sa, _sb, _ct,
     pe, ne, bf, bl) = sift_level_emit_padded(
        x3, pe, ne, bf, bl, zero3, zero3, zero3, zero3, fdone,
        jnp.asarray(False), n, endpoint_mode=endpoint_mode,
        interpret=interp,
    )

    # derive the zero carries from x3 so they inherit its varying-mesh
    # axes: under shard_map (parallel.batch.pjit_itd_sift) plain zeros
    # would type-mismatch the early-exit while_loop's varying outputs
    # (same derivation as the XLA path, itd.py:152-156)
    rzero = x3[:, 0, 0] * 0
    out_rot = jnp.zeros((levels,) + x3.shape, jnp.float32) + zero3
    base_levels = levels if store_baselines else 1
    out_base = jnp.zeros((base_levels,) + x3.shape, jnp.float32) + zero3
    done = rzero.astype(jnp.int32) != 0
    reason = rzero.astype(jnp.int32)
    ncomp = rzero.astype(jnp.int32)
    prev_base = zero3
    comp = zero3
    pending_err = err3

    def cond(state):
        i, carry = state
        done = carry[5]
        # early exit once every batch row has stopped: the remaining
        # trips would only write zero rows (rows are zero-gated after
        # stopping), so skipping them is output-identical
        return (i < levels) & ~jnp.all(done)

    def body(state, static_i=None):
        i, carry = state
        (rotation, baseline, prev_base, out_rot, out_base, done, reason,
         ncomp, pending_err, comp, pe, ne, bf, bl) = carry
        # unrolled trips write the output row straight into out_rot[i]
        # inside the kernel (aliased 4-D output) — no 32 MB copy per trip
        in_place = static_i is not None
        (new_base, new_rot, new_err, row, comp, nex, stop_a, stop_b,
         cont, pe, ne, bf, bl) = sift_level_emit_padded(
            baseline, pe, ne, bf, bl, rotation, prev_base, pending_err,
            comp, done, i >= max_iteration + 1, n,
            endpoint_mode=endpoint_mode, interpret=interp,
            out_levels=out_rot if in_place else None,
            level_idx=static_i,
        )
        out_rot = row if in_place else out_rot.at[i].set(row)
        if store_baselines:
            base_row = jnp.where(cont[:, None, None], baseline,
                                 jnp.zeros_like(baseline))
            out_base = out_base.at[i].set(base_row)

        stopping = stop_a | stop_b
        ncomp = jnp.where(stopping, i + 1, ncomp)
        reason = jnp.where(
            stop_a, STOP_FLAT, jnp.where(stop_b, STOP_BUDGET, reason)
        )
        done = done | stopping
        return (i + 1, (new_rot, new_base, baseline, out_rot, out_base,
                        done, reason, ncomp, new_err, comp, pe, ne, bf, bl))

    carry = (rot3, base3, prev_base, out_rot, out_base, done, reason,
             ncomp, pending_err, comp, pe, ne, bf, bl)
    if early_exit:
        # dynamic-cond loop: skips trips once every row stopped, but the
        # data-dependent bound costs ~1 ms/trip of lost dispatch
        # pipelining at 8x1M — worth it only when signals stop well
        # before the budget
        _, carry = lax.while_loop(cond, body, (jnp.int32(0), carry))
    else:
        # static trip count (<= max_iteration + 2, typically ~13): unroll
        # in Python.  A lax loop assigns each carry a fixed state buffer,
        # and this body ROTATES its big arrays through the carry slots
        # (new rotation lands in prev_base's donated buffer, the baseline
        # in a fill channel's, ...), so every trip pays a full set of
        # state copies — measured ~3.5 ms/trip at 8x1M on v5e vs 0.55 ms
        # for the same level straight-line.  Unrolling gives XLA's buffer
        # assigner the whole chain at once.
        for i in range(levels):
            _, carry = body((jnp.int32(i), carry), static_i=i)
    out_rot, out_base, reason, ncomp, comp = (
        carry[3], carry[4], carry[6], carry[7], carry[9]
    )

    def crop(a, lead):
        return a.reshape((lead, rows, npad))[..., :n]

    return SiftResult(
        rotations=crop(out_rot, levels).reshape(
            (levels,) + batch_shape + (n,)),
        baselines=crop(out_base, base_levels).reshape(
            (base_levels,) + batch_shape + (n,)),
        num_components=ncomp.reshape(batch_shape),
        stop_reason=reason.reshape(batch_shape),
        correction=crop(comp[None], 1)[0].reshape(
            batch_shape + (n,)).astype(x.dtype),
    )


def _itd_sift_fused(x, max_iteration, endpoint_mode, store_baselines,
                    fold_emit=None, position_encoding=None):
    """TPU fast path v2: ONE reverse-walking kernel per trip
    (``sift_level_fused_padded``) — the reverse scan chains its suffix
    through the kernel's SMEM carry, the forward scan is seeded from an
    XLA per-block fill-state fold (one 5-channel reduce incl. the extrema
    count), and the 4 forward fill channels never touch HBM.  Loop
    semantics and outputs are bit-identical to the two-kernel emit path
    (the fold is pure selects, so association order is irrelevant).

    ``fold_emit`` (default: the ``PYITD_FOLD_EMIT`` env flag) sources
    each trip's forward folds + extrema count from the PREVIOUS trip's
    kernel (which computes the next level's partial block folds while the
    baseline is still in registers) instead of the per-trip full-array
    XLA reduce — bit-identical outputs, pinned in tests; kept opt-in
    until the on-chip A/B records a win."""
    import os as _os
    from functools import partial as _partial

    from ..ops.pallas_fill import _pad_edges, block_edge_scalars
    from ..ops.pallas_fill import fold_emit_states as _fe_states
    from ..ops.pallas_fill import level_block_states_fwd as _lbs_fwd
    from ..ops.pallas_fill import sift_level_fused_padded as _fused_padded

    if fold_emit is None:
        fold_emit = bool(_os.environ.get("PYITD_FOLD_EMIT"))

    levels = max_iteration + 2
    batch_shape = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    rows = x2.shape[0]
    interp = jax.default_backend() != "tpu"
    if position_encoding is None:
        encode = n > (1 << 24) or _force_pos_bits()
    else:
        encode = position_encoding == "bits"
    sift_level_fused_padded = _partial(_fused_padded, encode=encode)
    level_block_states_fwd = _partial(_lbs_fwd, encode=encode)
    fold_emit_states = _partial(_fe_states, encode=encode)

    x3, pe, ne, npad, nblk = _pad_edges(x2)
    zero3 = x3 * 0
    rzero = x3[:, 0, 0] * 0
    ffalse = rzero.astype(jnp.int32) != 0

    def edges(base3):
        pe, ne = block_edge_scalars(base3, nblk)
        flat = base3.reshape(rows, npad)
        bf = 0.5 * (flat[:, 0] + flat[:, 1])
        bl = 0.5 * (flat[:, n - 2] + flat[:, n - 1])
        return pe, ne, bf, bl

    bf = 0.5 * (x2[:, 0] + x2[:, 1])
    bl = 0.5 * (x2[:, n - 2] + x2[:, n - 1])

    # initial extraction: all-off flags -> row/compensation outputs inert
    _, fp0 = level_block_states_fwd(x3, n)
    (base3, rot3, perr3, _row, _c, *fold_raw) = sift_level_fused_padded(
        x3, pe, ne, bf, bl, fp0, ffalse, ffalse, ffalse,
        zero3, zero3, zero3, zero3, n, endpoint_mode=endpoint_mode,
        interpret=interp, donate_input=True,  # x3 dies here
        fold_emit=fold_emit)

    out_rot = jnp.zeros((levels,) + x3.shape, jnp.float32) + zero3
    base_levels = levels if store_baselines else 1
    out_base = jnp.zeros((base_levels,) + x3.shape, jnp.float32) + zero3
    done = ffalse
    reason = rzero.astype(jnp.int32)
    ncomp = rzero.astype(jnp.int32)
    prev_base3 = zero3
    comp3 = zero3

    for i in range(levels):
        pe, ne, bf, bl = edges(base3)
        if fold_emit:
            nex, fp = fold_emit_states(fold_raw[0], base3, pe, n)
        else:
            nex, fp = level_block_states_fwd(base3, n)
        stop_a = (~done) & (nex < 2)
        stop_b = (~done) & (~stop_a) & (i >= max_iteration + 1)
        cont = (~done) & (~stop_a) & (~stop_b)
        (new_base, new_rot, new_err, out_rot, comp3,
         *fold_raw) = sift_level_fused_padded(
            base3, pe, ne, bf, bl, fp, stop_a, stop_b, cont,
            rot3, prev_base3, perr3, comp3, n,
            endpoint_mode=endpoint_mode, interpret=interp,
            out_levels=out_rot, level_idx=i, fold_emit=fold_emit)
        if store_baselines:
            base_row = jnp.where(cont[:, None, None], base3,
                                 jnp.zeros_like(base3))
            out_base = out_base.at[i].set(base_row)
        stopping = stop_a | stop_b
        ncomp = jnp.where(stopping, i + 1, ncomp)
        reason = jnp.where(
            stop_a, STOP_FLAT, jnp.where(stop_b, STOP_BUDGET, reason)
        )
        done = done | stopping
        rot3, prev_base3, base3, perr3 = new_rot, base3, new_base, new_err

    def crop(a, lead):
        return a.reshape((lead, rows, npad))[..., :n]

    return SiftResult(
        rotations=crop(out_rot, levels).reshape(
            (levels,) + batch_shape + (n,)),
        baselines=crop(out_base, base_levels).reshape(
            (base_levels,) + batch_shape + (n,)),
        num_components=ncomp.reshape(batch_shape),
        stop_reason=reason.reshape(batch_shape),
        correction=crop(comp3[None], 1)[0].reshape(
            batch_shape + (n,)).astype(x.dtype),
    )


class ITD:
    """Drop-in style class API mirroring the reference's ``ITD``
    (``/root/reference/ITD.py:123-190``): construct, call ``itd(data)``,
    then read ``get_rotations()`` / ``get_baselines()``.

    ``extrema_detection`` accepts the reference's three declared options but,
    like the reference, only the "matlab" behavior is implemented (the other
    two are accepted and behave identically).

    Deviation from the reference, on purpose: the reference's ``__call__``
    forwards a keyword its own ``itd`` does not accept and would raise;
    here ``__call__`` simply works.
    """

    def __init__(self, extrema_detection: str = "matlab", *,
                 endpoint_mode: str = "reference", as_numpy: bool = False):
        if extrema_detection not in ("simple", "parabol", "matlab"):
            raise ValueError(
                "Only 'simple', 'matlab', and 'parabol' values supported"
            )
        self.extrema_detection = extrema_detection
        self.endpoint_mode = endpoint_mode
        self.as_numpy = as_numpy  # convert outputs to host numpy arrays
        self.rotations = None
        self.baselines = None

    def __call__(self, S, max_iteration: int = 11):
        return self.itd(S, max_iteration=max_iteration)

    def itd(self, data, max_iteration: int = 11):
        """Sift a single 1-D signal; returns the valid rotation rows
        (components; last row = residual trend) as a ``(n_comp, N)`` array.
        """
        x = jnp.asarray(data)
        if x.ndim != 1:
            raise ValueError("ITD.itd expects a 1-D signal; use itd_sift for batches")
        res = itd_sift(x, max_iteration, endpoint_mode=self.endpoint_mode)
        n = int(res.num_components)
        self.rotations = res.rotations[:n]
        # reference slice quirk: stop A exposes the stored baselines; stop B
        # additionally exposes one zero row past them (ITD.py:414,424)
        n_base = n - 1 if int(res.stop_reason) == STOP_FLAT else n
        self.baselines = res.baselines[:n_base]
        if self.as_numpy:
            import numpy as np

            self.rotations = np.asarray(self.rotations)
            self.baselines = np.asarray(self.baselines)
        return self.rotations

    def get_rotations(self):
        if self.rotations is None:
            raise ValueError(
                "No IPR found. Please, run ITD method or its variant first."
            )
        return self.rotations

    def get_baselines(self):
        if self.baselines is None:
            raise ValueError(
                "No baselines found. Please, run ITD method or its variant first."
            )
        return self.baselines

    def get_rotations_and_residual(self):
        """PyEMD-style convenience: ``(proper rotations, residual trend)``
        — the last valid row of :meth:`itd`'s output is the residual."""
        rot = self.get_rotations()
        return rot[:-1], rot[-1]
