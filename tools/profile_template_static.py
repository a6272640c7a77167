"""Sub-stage attribution of _template_fast_baseline_static at the densest
comb frequency (the ITD-Fourier hot path's dominant cost — 63 ms of the
114 ms cascade iteration, VERDICT r4 item 2).  Run on the chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_template_static.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pyitd_tpu.decomp.itd_fourier import _sine_template_static
    from pyitd_tpu.ops.cubic_baseline import _template_fast_baseline_static
    from pyitd_tpu.ops.tridiag import reference_spline_moments, _affine_scan

    n, sr = 1 << 20, 2048
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 50 * t) + 0.2 * rng.normal(size=n),
                    jnp.float32)
    templates = _sine_template_static(sr, n)
    pos_np, cnt = templates[0][:2]  # densest (first = highest frequency)
    print(f"densest: {cnt} knots", file=sys.stderr)

    def chain(fn, k):
        @jax.jit
        def run(a, salt):
            def body(i, c):
                s, seed = c
                o = fn(a + (salt + seed * 1e-12))
                cs = jnp.sum(o[..., :8].astype(jnp.float32))
                return s + cs, cs * 1e-9
            s, _ = lax.fori_loop(0, k, body,
                                 (jnp.float32(0), jnp.float32(0)))
            return s
        return run

    def stage(name, fn, lo=1, hi=5):
        flo, fhi = chain(fn, lo), chain(fn, hi)
        float(flo(x, 0.0)); float(fhi(x, 1.0))
        best = np.inf
        for r in range(3):
            t0 = time.time(); float(flo(x, 2.0 + r)); tl = time.time() - t0
            t0 = time.time(); float(fhi(x, 5.0 + r)); th = time.time() - t0
            best = min(best, (th - tl) / (hi - lo))
        print(f"{name:52s} {best*1e3:9.2f} ms", file=sys.stderr)
        return best

    # replicate the static path's internals (ops/cubic_baseline.py
    # _template_fast_baseline_static) stage by stage
    npdt = np.dtype(np.float32)
    count = cnt
    cap2 = count + 2
    k = np.arange(cap2)
    pos = np.zeros(cap2, np.int64)
    pos[:count] = np.asarray(pos_np[:count], np.int64)
    e_prev = np.concatenate([[0], pos[:-1]])
    e_next = np.concatenate([pos[1:], [0]])
    span = (e_next - e_prev).astype(npdt)
    w = (pos - e_prev).astype(npdt) / np.where(span == 0, 1, span)
    h = (e_next - pos).astype(npdt)
    h = np.where(k < count, h, np.zeros_like(h))
    h_j = jnp.asarray(h)
    pos_take = jnp.asarray(np.clip(pos, 0, n - 1))
    seg = np.searchsorted(pos[1:count], np.arange(n),
                          side="right").astype(np.int32)
    seg_j = jnp.asarray(seg)

    def knots_of(a):
        xe = jnp.take(a, pos_take, axis=-1)
        x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]],
                                 axis=-1)
        x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])],
                                 axis=-1)
        interior = 0.5 * (x_prev + jnp.asarray(w) * (x_next - x_prev)) + 0.5 * xe
        knots = interior
        knots = jnp.where(jnp.asarray(k == 0), xe, knots)
        knots = jnp.where(jnp.asarray(k == count - 1), 0.0, knots)
        knots = jnp.where(jnp.asarray(k == count), a[..., :1], knots)
        knots = jnp.where(jnp.asarray(k > count), 0.0, knots)
        return knots

    stage("s1 knot values (static gather + formula)", knots_of)

    kn = knots_of(x)
    kn = jax.block_until_ready(kn)

    def moments_of(a):
        return reference_spline_moments(knots_of(a), h_j, jnp.int32(count))

    stage("s2 knots + moments (affine scans)", moments_of)

    def eval_of(a):
        knots = knots_of(a)
        moments = reference_spline_moments(knots, h_j, jnp.int32(count))

        def shl(b):
            return jnp.concatenate([b[..., 1:], jnp.zeros_like(b[..., :1])],
                                   axis=-1)

        pos_f = jnp.asarray(pos.astype(npdt))
        lastlin = jnp.asarray((k == count - 2).astype(npdt))
        chan = jnp.stack(
            [jnp.broadcast_to(pos_f, a.shape[:-1] + (cap2,)),
             jnp.broadcast_to(h_j, a.shape[:-1] + (cap2,)),
             jnp.broadcast_to(lastlin, a.shape[:-1] + (cap2,)),
             knots, shl(knots), moments, shl(moments)], axis=-1)
        g = jnp.take(chan, seg_j, axis=-2)
        return g[..., 3]

    stage("s3 knots+moments+chan+row-gather", eval_of)
    stage("s4 full static baseline",
          lambda a: _template_fast_baseline_static(a, pos, count))

    # s5: truncated affine scan (propagator |B|<=~0.29 decays below f32
    # eps in ~16 terms; rounds=5 covers 32)
    idx = jnp.arange(cap2)

    def moments_trunc(a, rounds):
        knots = knots_of(a)
        cntj = jnp.int32(count)
        # inline reference_spline_moments 'affine' with truncated scans
        h_im1 = jnp.concatenate([jnp.zeros_like(h_j[:1]), h_j[:-1]])
        k_ip1 = jnp.concatenate([knots[1:], jnp.zeros_like(knots[:1])])
        k_im1 = jnp.concatenate([jnp.zeros_like(knots[:1]), knots[:-1]])

        def sdiv(p, q):
            return p / jnp.where(q == 0, jnp.ones_like(q), q)

        u = sdiv(h_im1, h_im1 + h_j)
        v = 1.0 - u
        rhs = 6.0 * sdiv(sdiv(k_ip1 - knots, h_j) - sdiv(knots - k_im1, h_im1),
                         h_im1 + h_j)
        active = (idx >= 1) & (idx < cntj)
        u = jnp.where(active, u, 0.0)
        v = jnp.where(active, v, 0.0)
        b0 = jnp.where(active, rhs, 0.0)
        v_im1 = jnp.concatenate([jnp.zeros_like(v[:1]), v[:-1]])
        d = 2.0 - u * v_im1
        A = jnp.where(active, sdiv(b0, d), 0.0)
        B = jnp.where(active, sdiv(-u, d), 1.0)

        def trunc_scan(A, B, rounds, reverse):
            c, Bp = A, B
            for s in range(rounds):
                sh = 1 << s
                if reverse:
                    cs = jnp.concatenate([c[sh:], jnp.zeros_like(c[:sh])])
                    bs = jnp.concatenate([Bp[sh:], jnp.zeros_like(Bp[:sh])])
                else:
                    cs = jnp.concatenate([jnp.zeros_like(c[:sh]), c[:-sh]])
                    bs = jnp.concatenate([jnp.zeros_like(Bp[:sh]), Bp[:-sh]])
                c = c + Bp * cs
                Bp = Bp * bs
            return c

        c = trunc_scan(A, B, rounds, False)
        b_f = jnp.where(active, c, b0)
        act_bwd = idx <= (cntj - 2)
        A2 = b_f
        B2 = jnp.where(act_bwd, -v, 0.0)
        b = trunc_scan(A2, B2, rounds, True)
        b = jnp.where((idx == 0) | (idx == cntj - 1), 0.0, b)
        return b

    for rounds in (5, 6):
        stage(f"s5 knots + TRUNCATED moments (rounds={rounds})",
              lambda a, r=rounds: moments_trunc(a, r))

    m_full = reference_spline_moments(knots_of(x), h_j, jnp.int32(count))
    for rounds in (4, 5, 6):
        m_t = moments_trunc(x, rounds)
        err = float(jnp.max(jnp.abs(m_t - m_full)))
        rel = err / float(jnp.max(jnp.abs(m_full)))
        print(f"trunc rounds={rounds}: max-abs err {err:.3e} (rel {rel:.3e})",
              file=sys.stderr)


if __name__ == "__main__":
    main()
