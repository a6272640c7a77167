"""Stage attribution for the structural sift backward at 8x1M.
Times, chained steady-state:

  * one fill2_pallas forward pass          (struct channels)
  * one batched fillv_pallas (2 channels)  (the round-4 read-back form)
  * one segsum_pallas (2 channels)         (the round-5 direct form)
  * one jnp.cumsum over (8, 1M)            (the scan route's substrate)
  * one FULL _structural_level_bwd call    (the whole level adjoint)
  * sift forward (the custom_vjp fwd re-run baked into grad)
  * sift grad (the whole backward)

Round-5 history: this tool's auto-path grad measurement (282 ms) is
what exposed tools/ab_structural_bwd.py's jit-cache bug — its forced
scan/pallas arms were both timing the scan executable (558 ms) while
the real fillv-ported backward ran 282.  See NOTES_ROUND5.md.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_bwd_stages.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pyitd_tpu import itd_sift
    from pyitd_tpu.ops import linear_baseline as lb
    from pyitd_tpu.ops.pallas_fill import fill2_pallas, fillv_pallas

    batch, n = 8, 1_000_000
    print(f"device: {jax.devices()[0]} ({batch}x{n})", file=sys.stderr)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None]))
        + 0.3 * rng.normal(size=(batch, n)),
        dtype=jnp.float32,
    )
    cts = tuple(
        jnp.asarray(rng.normal(size=(batch, n)).astype(np.float32))
        for _ in range(3))

    def chained(fn, inner):
        @jax.jit
        def run(a, salt):
            def body(i, carry):
                s, seed = carry
                out = fn(a + (seed * 1e-12 + salt))
                c = jnp.sum(out[..., :8].astype(jnp.float32))
                return s + c, c * 1e-9
            s, _ = lax.fori_loop(0, inner, body, (0.0, jnp.float32(0)))
            return s
        return run

    def stage(name, fn, k_lo=1, k_hi=8, reps=3):
        lo, hi = chained(fn, k_lo), chained(fn, k_hi)
        s0 = (time.time() % 1000.0) * 1e-7
        float(lo(x, s0)); float(hi(x, s0 + 1e-6))
        best = np.inf
        for r in range(reps):
            sr = s0 + 1e-6 * (2 + 2 * r)
            t0 = time.time(); float(lo(x, sr)); t_lo = time.time() - t0
            t0 = time.time(); float(hi(x, sr + 1e-6)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
        best = max(best, 1e-9)
        print(f"{name:42s} {best * 1e3:9.3f} ms", file=sys.stderr)
        return best

    it = jnp.arange(n, dtype=jnp.float32)[None, :]

    def knots_of(a):
        return lb._knot_mask(a)

    stage("fill2_pallas fwd (struct)",
          lambda a: fill2_pallas(it + 0 * a, a, knots_of(a))[1])
    stage("fillv_pallas x2ch (stacked rows)",
          lambda a: fillv_pallas(
              jnp.concatenate([a, a * 0.5], axis=0),
              jnp.tile(knots_of(a), (2, 1))))
    from pyitd_tpu.ops.pallas_fill import segsum_pallas

    stage("segsum_pallas x2ch (state channels)",
          lambda a: segsum_pallas((a, a * 0.5), knots_of(a),
                                  reverse=True)[0])
    stage("jnp.cumsum (8x1M)", lambda a: jnp.cumsum(a, axis=-1))
    stage("level adjoint (full)",
          lambda a: lb._structural_level_bwd(a, *cts, "reference"))
    stage("sift forward (10-level emit)",
          lambda a: itd_sift(a, 8, store_baselines=False).rotations,
          1, 8)

    grad_fn = jax.grad(
        lambda a: jnp.sum(jnp.square(
            itd_sift(a, 8, store_baselines=False).rotations)))
    stage("sift grad (whole)", grad_fn, 1, 4)


if __name__ == "__main__":
    main()
