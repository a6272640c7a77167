"""On-chip A/B: the sift's structural backward with XLA scan fills vs
the Pallas fill kernels (VERDICT r4 item 4 — the adjoint's cumsum
read-backs and structure fills are the same fill2/fillv shapes the
forward streams at ~0.7 ms/level; this measures the port).

Usage:  python tools/ab_structural_bwd.py [batch] [n]

Measures, steady-state (salted chained executions, chain-length
differencing — see bench_profile.py for why):
  * sift forward (emit path, 10 levels)
  * sift grad with fills='scan'   (round-4 shipped form)
  * sift grad with fills='pallas' (this round)
and checks the two grads agree to segment-sum rounding (round 5: the
pallas route sums knot segments directly via segsum_pallas while the
scan route differences a global cumsum, so the routes are no longer
bitwise-identical — the direct form is the tighter one).
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyitd_tpu import itd_sift
    from pyitd_tpu.ops import linear_baseline as lb

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dev = jax.devices()[0]
    print(f"device: {dev} ({batch}x{n})", file=sys.stderr)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None]))
        + 0.3 * rng.normal(size=(batch, n)),
        dtype=jnp.float32,
    )

    def fwd_fn(a):
        return itd_sift(a, 8, store_baselines=False).rotations

    grad_fn = jax.grad(lambda a: jnp.sum(jnp.square(fwd_fn(a))))

    orig = lb._structural_level_bwd

    def forced(fills):
        def f(xx, gr, gb, ge, em, **_kw):
            return orig(xx, gr, gb, ge, em, fills=fills)
        return f

    def chained(fn, inner):
        @jax.jit
        def run(a, salt):
            def body(i, carry):
                s, seed = carry
                out = fn(a + (seed * 1e-12 + salt))
                c = jnp.sum(out[..., :8].astype(jnp.float32))
                return s + c, c * 1e-9
            s, _ = jax.lax.fori_loop(0, inner, body, (0.0, jnp.float32(0)))
            return s
        return run

    def stage_time(fn, k_lo=1, k_hi=4, reps=3):
        lo, hi = chained(fn, k_lo), chained(fn, k_hi)
        s0 = (time.time() % 1000.0) * 1e-7
        float(lo(x, s0))
        float(hi(x, s0 + 1e-6))
        best = np.inf
        for r in range(reps):
            sr = s0 + 1e-6 * (2 + 2 * r)
            t0 = time.time(); float(lo(x, sr)); t_lo = time.time() - t0
            t0 = time.time(); float(hi(x, sr + 1e-6)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
        return max(best, 1e-9)

    # correctness first: the two routes agree to segment-sum rounding.
    # jax.clear_caches() between variants is LOAD-BEARING: itd_sift's
    # inner jit cache otherwise serves the first-traced variant to both
    # (the round-4 A/B was defeated by exactly this — it reported the
    # scan executable twice as "bitexact, 1.01x"; see NOTES_ROUND5.md)
    lb._structural_level_bwd = forced("scan")
    jax.clear_caches()
    g_scan = np.asarray(jax.jit(grad_fn)(x))
    lb._structural_level_bwd = forced("pallas")
    jax.clear_caches()
    g_pal = np.asarray(jax.jit(grad_fn)(x))
    lb._structural_level_bwd = orig
    # gate on relative RMS, not max: the backward chain is a linear map
    # of the cotangents whose condition number amplifies per-level
    # rounding ~10^3x at 1M/8-level scale, so pointwise tails differ
    # between ANY two roundings (tools/probe_bwd_truth.py: BOTH f32
    # routes sit at the same rms from the f64 truth — the tails are
    # conditioning, not a route bug)
    diff = g_scan - g_pal
    rel_rms = np.sqrt((diff ** 2).mean() / max((g_scan ** 2).mean(), 1e-30))
    ok = np.array_equal(g_scan, g_pal) or rel_rms < 1e-2
    print(f"grad scan-vs-pallas: {'ok' if ok else 'DIVERGED'} "
          f"rel-rms={rel_rms:.3e} maxabs={np.abs(diff).max():.3e} "
          f"(peak {np.abs(g_scan).max():.3e})")

    t_fwd = stage_time(fwd_fn, 1, 8)
    print(f"forward           : {t_fwd * 1e3:9.2f} ms")

    lb._structural_level_bwd = forced("scan")
    jax.clear_caches()
    t_scan = stage_time(grad_fn)
    print(f"grad (scan fills) : {t_scan * 1e3:9.2f} ms  "
          f"({t_scan / t_fwd:.1f}x fwd)")

    lb._structural_level_bwd = forced("pallas")
    jax.clear_caches()
    t_pal = stage_time(grad_fn)
    print(f"grad (pallas segsum): {t_pal * 1e3:7.2f} ms  "
          f"({t_pal / t_fwd:.1f}x fwd, {t_scan / t_pal:.2f}x faster)")
    lb._structural_level_bwd = orig


if __name__ == "__main__":
    main()
