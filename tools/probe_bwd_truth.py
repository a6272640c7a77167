"""Adjudicate the structural-backward fill routes against f64 ground
truth at bench scale (follow-up to tools/ab_structural_bwd.py, whose
scan-vs-pallas f32 comparison DIVERGED at 8x1M — 18% of peak — once the
jit-cache bug was fixed; see NOTES_ROUND5.md).

Computes the full sift grad three ways on the attached device:
  * f32, fills='scan'   (cumsum differences — O(n)-mass cancellation)
  * f32, fills='pallas' (direct segmented sums)
  * f64, fills='scan'   (ground truth; f64 forces the scan route)
and prints each f32 route's error against the f64 truth, per level count.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bwd_truth.py [batch] [n] [levels]
"""
import sys

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from pyitd_tpu import itd_sift
    from pyitd_tpu.ops import linear_baseline as lb

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(f"device: {jax.devices()[0]} ({batch}x{n}, max_iteration={iters})",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    sig = (np.sin(20 * t[None] * (1 + 0.2 * t[None]))
           + 0.3 * rng.normal(size=(batch, n)))

    def grad_of(x, fills):
        orig = lb._structural_level_bwd

        def forced(xx, gr, gb, ge, em, **_kw):
            return orig(xx, gr, gb, ge, em, fills=fills)

        lb._structural_level_bwd = forced
        jax.clear_caches()
        try:
            f = jax.grad(lambda a: jnp.sum(jnp.square(
                itd_sift(a, iters, store_baselines=False).rotations)))
            return np.asarray(jax.jit(f)(x))
        finally:
            lb._structural_level_bwd = orig

    x32 = jnp.asarray(sig, jnp.float32)
    x64 = jnp.asarray(sig, jnp.float64)

    g_truth = grad_of(x64, "scan")
    peak = np.abs(g_truth).max()
    print(f"f64 truth peak    : {peak:.4e}")
    for fills in ("scan", "pallas"):
        g = grad_of(x32, fills).astype(np.float64)
        err = np.abs(g - g_truth)
        print(f"f32 {fills:7s} vs f64: maxabs {err.max():.4e}  "
              f"rel-of-peak {err.max() / peak:.4e}  "
              f"rms {np.sqrt((err ** 2).mean()):.4e}")


if __name__ == "__main__":
    main()
