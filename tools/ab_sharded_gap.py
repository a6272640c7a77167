"""Same-process on-chip gap measurement: sharded 1x1-mesh sift vs the
plain fused sift.

The ratio (sharded / plain) is the figure of merit — it cancels chip-era
drift, so runs before/after an XLA-side change to the sharded level are
comparable across sessions.  Also asserts the two paths stay bitwise
identical (rotations + correction), the same gate as
tests/test_onchip.py::test_sharded_sift_matches_plain_onchip.

Timing discipline per bench.py: each measurement is ONE jitted call
chaining data-dependent salted repetitions; per-iteration time is the
difference of two chain lengths (cancels the relay dispatch floor).
Salts are O(1) values (f32 tiny salts are bitwise no-ops and hit the
relay result cache).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu import itd_sift
from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift


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
    mesh1 = make_mesh(1, seq=1)

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

    plain = lambda a: itd_sift(a, 8, store_baselines=False).rotations[0]
    shard = lambda a: sharded_itd_sift(a, mesh1, 8)[0][0]

    print("timing plain fused sift...", file=sys.stderr)
    t_plain = stage_time(plain)
    print("timing sharded 1x1 sift...", file=sys.stderr)
    t_shard = stage_time(shard)
    print(
        f"plain: {t_plain*1e3:.2f} ms   sharded 1x1: {t_shard*1e3:.2f} ms"
        f"   ratio: {t_shard/t_plain:.3f}",
        file=sys.stderr,
    )

    # bitwise gate (small n so the parity run is cheap)
    xs = x[:, :65536]
    res = itd_sift(xs, 6, store_baselines=False)
    rot_s, ncomp_s, reason_s, corr_s = sharded_itd_sift(xs, mesh1, 6)
    ok = (
        bool(jnp.all(res.rotations == rot_s))
        and bool(jnp.all(res.correction == corr_s))
        and bool(jnp.all(res.num_components == ncomp_s))
        and bool(jnp.all(res.stop_reason == reason_s))
    )
    print(f"bitwise sharded==plain at 8x65536: {ok}", file=sys.stderr)
    print(
        {"plain_ms": round(t_plain * 1e3, 2),
         "sharded_ms": round(t_shard * 1e3, 2),
         "ratio": round(t_shard / t_plain, 4),
         "bitwise": ok}
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
