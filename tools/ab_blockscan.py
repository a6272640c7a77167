"""Same-process on-chip A/B harness for _block_scan variants.

``_old_block_scan`` below is the round-3 baseline form (unrolled doubling
stages, stage 3 as TWO full-block broadcast combines).  The script patches
pallas_fill._block_scan back to it, compiles+times the full sift, restores
the in-tree form, re-times, and checks rotations + correction are bitwise
identical.  Same process => same chip era (the only A/B the relay permits).

Findings so far (8x1M, v5e):
* packed stage-2 (summaries reshaped (rows,1)->(1,rows) so the 6 doubling
  rounds run on one vreg): bitwise equal but 5.5%% SLOWER (33.18 ->
  35.12 ms) — the sublane<->lane relayout casts cost more than the
  mostly-idle-vreg sublane scan they replace.  Reverted.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

import pyitd_tpu.ops.pallas_fill as pf
from pyitd_tpu import itd_sift

_new_block_scan = pf._block_scan


def _old_block_scan(state, reverse, carry_in, rows, rolled=False):
    lane_scan = pf._doubling_scan_rolled if rolled is True else pf._doubling_scan
    sub_scan = pf._doubling_scan_rolled if rolled else pf._doubling_scan
    state = lane_scan(state, axis=1, steps=7, reverse=reverse)
    edge = 0 if reverse else pf._LANES - 1
    summ = tuple(s[:, edge: edge + 1] for s in state)
    pref = sub_scan(summ, axis=0, steps=int(np.log2(rows)), reverse=reverse)
    pref = pf._shifted(pref, 1, 0, reverse)
    state = pf._state_combine(
        tuple(jnp.broadcast_to(p, (rows, pf._LANES)) for p in pref), state)
    carry_t = tuple(jnp.full((rows, pf._LANES), c) for c in carry_in)
    state = pf._state_combine(carry_t, state)
    erow = 0 if reverse else rows - 1
    ecol = 0 if reverse else pf._LANES - 1
    carry_out = tuple(s[erow, ecol] for s in state)
    return state, carry_out


def main():
    batch, n = 8, 1_000_000
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None]))
        + np.sin(13 * t[None])
        + 0.3 * rng.normal(size=(batch, n)),
        dtype=jnp.float32,
    )
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    def timed(tag):
        @jax.jit
        def run(a, salt, inner):
            def body(i, carry):
                acc, seed = carry
                res = itd_sift(a + (salt + seed * 1e-12), 8,
                               store_baselines=False)
                cs = jnp.sum(res.rotations[0, :, ::65536]) + jnp.sum(
                    res.num_components).astype(jnp.float32)
                return acc + cs, cs * 1e-9
            return jax.lax.fori_loop(
                0, inner, body, (jnp.float32(0), jnp.float32(0)))[0]

        t0 = time.time()
        float(run(x, 0.0, 1))
        print(f"[{tag}] compile+first: {time.time()-t0:.1f}s", file=sys.stderr)
        float(run(x, 1.0, 6))
        best = np.inf
        for r in range(3):
            t0 = time.time(); float(run(x, 2.0 + r, 1)); tl = time.time() - t0
            t0 = time.time(); float(run(x, 5.0 + r, 6)); th = time.time() - t0
            best = min(best, (th - tl) / 5)
        print(f"[{tag}] time/sift: {best*1e3:.2f} ms "
              f"({batch*n/best/1e6:.1f} Msamp/s)", file=sys.stderr)
        res = jax.jit(lambda a: itd_sift(a, 8, store_baselines=False))(x)
        return best, (np.asarray(res.rotations), np.asarray(res.correction))

    pf._block_scan = _old_block_scan
    t_old, out_old = timed("old sublane")

    pf._block_scan = _new_block_scan
    t_new, out_new = timed("new packed")

    bit_rot = np.array_equal(out_old[0], out_new[0])
    bit_cor = np.array_equal(out_old[1], out_new[1])
    print(f"bitwise rotations equal: {bit_rot}, correction equal: {bit_cor}",
          file=sys.stderr)
    print(f"speedup: {t_old/t_new:.3f}x ({t_old*1e3:.2f} -> {t_new*1e3:.2f} ms)")
    if not (bit_rot and bit_cor):
        sys.exit(1)


if __name__ == "__main__":
    main()
