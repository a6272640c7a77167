"""Kalman-sweep multi-head gains (AGI_(1).ipynb ``KalmanSweepMHGainsOptimal``).

A gain-producing attention substitute: a fused projection of (Q, K,
first-head-broadcast V) yields per-head diagonal observation models H,
observations y, adaptive noise R (with a sink gate that inflates R to
ignore inputs), and a transition modulation; ``n_passes`` parallel Kalman
sweeps (shift-and-predict across time, diagonal updates) refine the state,
and the final Kalman gain is returned as the output.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["KalmanSweepMHGains"]


class KalmanSweepMHGains(nn.Module):
    n_head: int
    n_passes: int = 12
    init_log_q: float = -2.0
    eps: float = 1e-6

    @nn.compact
    def __call__(self, q, k, v):
        b, n, d = q.shape
        h = self.n_head
        dh = d // h

        v_resh = v.reshape(b, n, h, dh)
        v_shared = jnp.broadcast_to(v_resh[:, :, :1, :], (b, n, h, dh)).reshape(b, n, d)

        # reference layout quirk (AGI_(1).ipynb: `cat([Q,K,V], -1).view(
        # B*N*H, 3dh)`): the fused projection's per-"head" input is a
        # CONTIGUOUS 3dh slice of the full [Q | K | V_broadcast] embedding
        # — head 0 sees Q channels of several heads, later heads see mixed
        # K/V channels — NOT the per-head [Q_h, K_h, V_h].  Preserved.
        qkv = jnp.concatenate([q, k, v_shared], axis=-1).reshape(b, n, h, 3 * dh)
        out = nn.Dense(5 * dh, name="fused_proj")(qkv)  # (B,N,H,5dh)
        h_raw, y, r_raw, a_mod, sink_raw = jnp.split(out, 5, axis=-1)

        scales = self.param("scales", nn.initializers.ones, (3, h))
        a_base = self.param("A_base", lambda key, s: jnp.eye(dh), (dh, dh))
        log_q = self.param(
            "logQ", nn.initializers.constant(self.init_log_q), (h, dh)
        )

        h_diag = jax.nn.sigmoid(h_raw) * scales[0][None, None, :, None]
        sink = jax.nn.sigmoid(sink_raw) * scales[2][None, None, :, None]
        r_base = jax.nn.softplus(r_raw) * scales[1][None, None, :, None] + self.eps
        r_diag = r_base / (sink + 0.01)

        a_sig = jax.nn.sigmoid(a_mod)  # (B,N,H,dh): row modulation of A_base
        q_diag = jnp.maximum(jnp.exp(log_q), self.eps)[None, None]

        p = jnp.ones((b, n, h, dh), q.dtype)
        hp = h_diag * p
        s = hp * h_diag + r_diag
        k_gain = hp / s
        if self.n_passes == 1:
            return k_gain.reshape(b, n, d)

        x = k_gain * y
        p = p - k_gain * hp

        # reference quirk: the modulation rows come from the FLAT prefix
        # `A[:B*(N-1)*H]` (b-major order), not the per-batch [:, :-1]
        # slice — for B > 1 the rows misalign across batch elements.
        # Deterministic and trained-through in the reference; preserved.
        a_mod_rows = a_sig.reshape(b * n * h, dh)[: b * (n - 1) * h]
        a_mod_rows = a_mod_rows.reshape(b, n - 1, h, dh)

        for _ in range(1, self.n_passes):
            # predict: shift state forward one step through the modulated A
            # (the reference scales A's *rows* by the modulation: mod * (A x))
            x_pred = a_mod_rows * jnp.einsum(
                "ed,bnhd->bnhe", a_base, x[:, :-1]
            )
            x_prev = jnp.concatenate(
                [jnp.zeros((b, 1, h, dh), x.dtype), x_pred], axis=1
            )
            p_prev = jnp.concatenate(
                [jnp.ones((b, 1, h, dh), p.dtype), p[:, :-1] + q_diag], axis=1
            )
            hp = h_diag * p_prev
            s = hp * h_diag + r_diag
            k_gain = hp / s
            innov = y - h_diag * x_prev
            x = x_prev + k_gain * innov
            p = p_prev - k_gain * hp

        return k_gain.reshape(b, n, d)
