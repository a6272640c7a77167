"""Same-process on-chip A/B: fold-emit fused sift vs the default fused
sift.

fold_emit=True sources each trip's forward block folds + extrema count
from the PREVIOUS trip's kernel (computed while the baseline is still in
registers) instead of the per-trip full-array XLA reduce
(``level_block_states_fwd``, ~0.33 ms/level at 8x1M).  The in-kernel cost
is ~5 native reductions + one knot-mask recompute per block, so the sign
of the trade is an empirical question — this script answers it.

The ratio (fold / default) cancels chip-era drift.  Also asserts bitwise
identity on all outputs (the same contract the CPU tests pin).

Timing discipline per bench.py: one jitted call chaining data-dependent
salted repetitions; per-iteration time is the difference of two chain
lengths (cancels the relay dispatch floor).  Salts are O(1) values.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu.decomp.itd import _itd_sift_fused


def main():
    batch, n = 8, 1_000_000
    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None]))
        + 0.3 * rng.normal(size=(batch, n)),
        dtype=jnp.float32,
    )

    def chk(outs):
        return jnp.sum(outs[..., :8].astype(jnp.float32))

    def chained(fn, inner):
        @jax.jit
        def run(a, salt):
            def body(i, carry):
                s, seed = carry
                out = fn(a + (seed * 1e-12 + salt))
                c = chk(out)
                return s + c, c * 1e-9
            s, _ = jax.lax.fori_loop(0, inner, body, (0.0, jnp.float32(0)))
            return s
        return run

    def stage_time(fn, k_lo=1, k_hi=6, reps=3):
        lo, hi = chained(fn, k_lo), chained(fn, k_hi)
        t0 = time.time(); float(lo(x, 0.0)); print(
            f"  compile lo: {time.time()-t0:.1f}s", file=sys.stderr)
        t0 = time.time(); float(hi(x, 1.0)); print(
            f"  compile hi: {time.time()-t0:.1f}s", file=sys.stderr)
        best = np.inf
        for r in range(reps):
            t0 = time.time(); float(lo(x, 2.0 + r)); t_lo = time.time() - t0
            t0 = time.time(); float(hi(x, 5.0 + r)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
        return best

    def run_default(a):
        return _itd_sift_fused(a, 8, "reference", False,
                               fold_emit=False).rotations[0]

    def run_fold(a):
        return _itd_sift_fused(a, 8, "reference", False,
                               fold_emit=True).rotations[0]

    print("timing default fused sift...", file=sys.stderr)
    t_def = stage_time(run_default)
    print("timing fold-emit fused sift...", file=sys.stderr)
    t_fold = stage_time(run_fold)
    print(
        f"default: {t_def*1e3:.2f} ms   fold-emit: {t_fold*1e3:.2f} ms"
        f"   ratio: {t_fold/t_def:.3f}",
        file=sys.stderr,
    )

    # sharded (1x1 mesh) twin: the lever replaces the 9-channel
    # full-shard reduce there, the identified remainder of the
    # sharded-vs-plain gap
    import os

    from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift

    mesh1 = make_mesh(1, seq=1)

    def run_sharded(a):
        return sharded_itd_sift(a, mesh1, 8)[0][0]

    print("timing sharded 1x1 (default)...", file=sys.stderr)
    t_sdef = stage_time(run_sharded)
    os.environ["PYITD_FOLD_EMIT"] = "1"
    try:
        print("timing sharded 1x1 (fold-emit)...", file=sys.stderr)
        t_sfold = stage_time(run_sharded)
        # bitwise gates (small n so the parity runs are cheap)
        xs = x[:, :65536]
        sa = sharded_itd_sift(xs, mesh1, 6)
    finally:
        del os.environ["PYITD_FOLD_EMIT"]
    sb = sharded_itd_sift(xs, mesh1, 6)
    ok_sh = all(bool(jnp.all(ga == gb)) for ga, gb in zip(sa, sb))
    print(
        f"sharded default: {t_sdef*1e3:.2f} ms   fold-emit:"
        f" {t_sfold*1e3:.2f} ms   ratio: {t_sfold/t_sdef:.3f}",
        file=sys.stderr,
    )

    # cubic tier twin: the ksite kernel's fold replaces the
    # ksite_block_states two-array sweep (zero excluded samples there)
    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract

    def run_cubic(a):
        return cubic_baseline_extract(a, capacity=a.shape[-1],
                                      eval_backend="fills").baseline

    print("timing cubic fills (default)...", file=sys.stderr)
    t_cdef = stage_time(run_cubic)
    os.environ["PYITD_FOLD_EMIT"] = "1"
    try:
        print("timing cubic fills (fold-emit)...", file=sys.stderr)
        t_cfold = stage_time(run_cubic)
        ca = cubic_baseline_extract(xs, capacity=xs.shape[-1],
                                    eval_backend="fills")
    finally:
        del os.environ["PYITD_FOLD_EMIT"]
    cb = cubic_baseline_extract(xs, capacity=xs.shape[-1],
                                eval_backend="fills")
    ok_cu = bool(jnp.all(ca.baseline == cb.baseline))
    print(
        f"cubic default: {t_cdef*1e3:.2f} ms   fold-emit:"
        f" {t_cfold*1e3:.2f} ms   ratio: {t_cfold/t_cdef:.3f}",
        file=sys.stderr,
    )

    a = _itd_sift_fused(xs, 6, "reference", False, fold_emit=True)
    b = _itd_sift_fused(xs, 6, "reference", False, fold_emit=False)
    ok = (
        bool(jnp.all(a.rotations == b.rotations))
        and bool(jnp.all(a.correction == b.correction))
        and bool(jnp.all(a.num_components == b.num_components))
        and bool(jnp.all(a.stop_reason == b.stop_reason))
    )
    print(f"bitwise fold==default at 8x65536: plain {ok} sharded {ok_sh} "
          f"cubic {ok_cu}", file=sys.stderr)
    print(
        {"default_ms": round(t_def * 1e3, 2),
         "fold_ms": round(t_fold * 1e3, 2),
         "ratio": round(t_fold / t_def, 4),
         "sharded_default_ms": round(t_sdef * 1e3, 2),
         "sharded_fold_ms": round(t_sfold * 1e3, 2),
         "sharded_ratio": round(t_sfold / t_sdef, 4),
         "cubic_default_ms": round(t_cdef * 1e3, 2),
         "cubic_fold_ms": round(t_cfold * 1e3, 2),
         "cubic_ratio": round(t_cfold / t_cdef, 4),
         "bitwise": ok and ok_sh and ok_cu}
    )
    if not (ok and ok_sh and ok_cu):
        sys.exit(1)


if __name__ == "__main__":
    main()
