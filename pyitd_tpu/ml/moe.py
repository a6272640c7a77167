"""Recurrent-MLP & hash-MoE experiment family (``/root/reference/RMLP.py``).

* :class:`LinearBilinear` / :class:`BiMLP` — bilinear-gated MLPs
  (``RMLP.py:13-53``, including the odd ``act(fc1(x+1))-1`` shifts);
* :class:`ModCRTMoE` — hard hash routing (``RMLP.py:114-356``): a random
  linear hash folded mod per-channel periods into residues over pairwise
  coprime moduli; Chinese-Remainder candidates from every channel pair; the
  candidate with maximum residue agreement picks the expert (mod E);
* :func:`router_topk` — straight-through top-k with softmax gate weights
  and the reference's custom backward (``RMLP.py:740-763``);
* :class:`FastLearnedCellX3` — tape-addressed mixture cell: random address
  projection, three top-k routed weight tapes (W1/W2/b2) applied as
  gather-einsum-scatter mixtures (``RMLP.py:825-906``).

TPU design notes: expert application uses per-token gathered weight tensors
(einsum over an (assignments, out, in) gather) — the XLA-friendly
formulation of the reference's grouped GEMMs — or, with
``dispatch="capacity"``, GShard-style one-hot dispatch buffers whose dense
per-expert GEMMs ride the MXU and shard over an expert-parallel mesh axis
(``parallel/train.py``); routing runs in pure int32 arithmetic (no host
sync).  The UltraMemv5 shared-memory-bank family lives in ``ultramem.py``.
"""
from __future__ import annotations

import math
from typing import List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "LinearBilinear",
    "BiMLP",
    "ModCRTMoE",
    "capacity_dispatch",
    "router_topk",
    "FastLearnedCellX3",
    "first_primes",
]


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    if n % 2 == 0:
        return n == 2
    f = 3
    while f * f <= n:
        if n % f == 0:
            return False
        f += 2
    return True


def first_primes(k: int, start: int = 3) -> List[int]:
    out, p = [], max(3, start | 1)
    while len(out) < k:
        if _is_prime(p):
            out.append(p)
        p += 2
    return out


def _inv_mod(a: int, m: int) -> int:
    t, new_t, r, new_r = 0, 1, m, a % m
    while new_r:
        q = r // new_r
        t, new_t = new_t, t - q * new_t
        r, new_r = new_r, r - q * new_r
    if r != 1:
        raise ValueError("not invertible")
    return t % m


class LinearBilinear(nn.Module):
    """RMLP.py:13-35: low-rank bilinear gate folded into the first layer."""

    rank: int
    q_frac: float = 0.6
    alpha: float = 1.0
    hidden: int | None = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = self.hidden or d
        dq = max(1, min(d - 1, int(round(self.q_frac * d))))
        dc = d - dq
        u = self.param("U", lambda k, s: jax.random.normal(k, s) / math.sqrt(dq), (dq, self.rank))
        v = self.param("V", lambda k, s: jax.random.normal(k, s) / math.sqrt(dc), (dc, self.rank))
        z = (x[..., :dq] @ u) * (x[..., dq:] @ v)
        pre = nn.Dense(h, use_bias=False, name="W1")(x) + self.alpha * nn.Dense(
            h, use_bias=False, name="B"
        )(z)
        return nn.Dense(d, use_bias=True, name="W2")(nn.gelu(pre))


class BiMLP(nn.Module):
    """RMLP.py:38-53 (the +1/-1 shifts are the reference's)."""

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(LinearBilinear(rank=d // 2, name="fc1")(x + 1.0)) - 1.0
        return nn.Dense(d, use_bias=True, name="fc2")(h) - 1.0


def capacity_dispatch(eid: jax.Array, num_experts: int, capacity: int) -> jax.Array:
    """GShard-style dispatch tensor for hard single-expert routing.

    Returns a 0/1 float ``(tokens, num_experts, capacity)`` tensor D with
    ``D[n, e, c] = 1`` iff token n is the c-th token routed to expert e and
    ``c < capacity`` (tokens beyond an expert's capacity are dropped — they
    contribute zeros, the standard capacity-factor semantics).  Dispatch and
    combine are then dense einsums (``nec,nd->ecd`` / ``nec,ecd->nd``), which
    is the MXU-friendly TPU formulation of the reference's per-token weight
    gathers (RMLP.py:162-197) and the one that shards over an expert mesh
    axis: with the expert banks laid out ``P('model', ...)`` GSPMD keeps the
    per-expert GEMMs local and inserts the token all-to-alls.
    """
    one = jax.nn.one_hot(eid, num_experts, dtype=jnp.int32)  # (N, E)
    pos = jnp.cumsum(one, axis=0) * one - 1  # slot within expert, -1 if unrouted
    slot = jax.nn.one_hot(pos, capacity, dtype=jnp.float32)  # (N, E, C); -1 -> 0s
    return slot * one[..., None].astype(jnp.float32)


class ModCRTMoE(nn.Module):
    """Hard CRT-consensus hash router + expert bank (RMLP.py:198-345).

    ``dispatch="gather"`` (default) reproduces the reference exactly: every
    token is served by its routed expert via per-token gathered weights.
    ``dispatch="capacity"`` uses :func:`capacity_dispatch` buffers instead —
    identical outputs whenever no expert overflows ``capacity``, and the
    formulation to use under an expert-parallel mesh (see
    ``parallel/train.py``).
    """

    num_experts: int
    moduli: Sequence[int] | None = None
    seed: int = 0
    dispatch: str = "gather"
    capacity: int | None = None
    capacity_factor: float = 2.0

    def _moduli(self) -> List[int]:
        if self.moduli is not None:
            return list(self.moduli)
        k = 3
        while True:
            primes = first_primes(k)
            prod = int(np.prod(primes))
            if prod >= max(4 * self.num_experts, 256):
                return primes
            k += 1

    @nn.compact
    def __call__(self, x):
        orig_shape = x.shape
        d = x.shape[-1]
        xf = x.reshape(-1, d)
        moduli = self._moduli()
        kch = len(moduli)

        rng = np.random.default_rng(self.seed)
        w_hash = jnp.asarray(rng.normal(size=(d, kch)) / math.sqrt(d), x.dtype)
        b_hash = jnp.asarray(rng.normal(size=(kch,)) * 0.01, x.dtype)
        periods = jnp.ones((kch,), x.dtype)
        m = jnp.asarray(moduli, jnp.int32)

        # residues (ModuloHash): fold then round to the nearest bin
        s = xf @ w_hash + b_hash
        f = jnp.remainder(s, periods)
        r = jnp.floor(f * (m.astype(x.dtype) / periods) + 0.5)
        r = jnp.remainder(r, m.astype(x.dtype)).astype(jnp.int32)  # (N, K)

        # CRT candidates over channel pairs
        cands = []
        for i in range(kch):
            for j in range(i + 1, kch):
                m1, m2 = moduli[i], moduli[j]
                inv = _inv_mod(m1 % m2, m2)
                t = ((r[:, j] - r[:, i]) % m2) * inv % m2
                cands.append((r[:, i] + t * m1) % (m1 * m2))
        cand = jnp.stack(cands, axis=1)  # (N, P)

        match = (cand[:, :, None] % m[None, None, :]) == r[:, None, :]
        scores = jnp.sum(match, axis=-1)
        best = jnp.take_along_axis(cand, jnp.argmax(scores, axis=1)[:, None], axis=1)[:, 0]
        eid = (best % self.num_experts).astype(jnp.int32)
        eid = jax.lax.stop_gradient(eid)

        # expert bank (RowWiseExpertsMLP): gathered per-token weights.
        # The expert axis is a BATCH axis for init purposes — plain
        # he_uniform would fold it (and the output dim) into fan_in,
        # under-scaling the init by sqrt(2*E); torch's kaiming computes
        # fan_in from the contraction dim alone.
        he_expert = nn.initializers.variance_scaling(
            2.0, "fan_in", "uniform", in_axis=-1, out_axis=-2, batch_axis=0)
        e, hdim = self.num_experts, 2 * d
        w1 = self.param("W1", he_expert, (e, hdim, d))
        w2 = self.param("W2", he_expert, (e, d, hdim))
        b2 = self.param("b2", nn.initializers.zeros, (e, d))

        if self.dispatch == "capacity":
            n = xf.shape[0]
            cap = self.capacity
            if cap is None:
                cap = max(1, int(math.ceil(n / e * self.capacity_factor)))
            disp = capacity_dispatch(eid, e, cap).astype(x.dtype)  # (N, E, C)
            xe = jnp.einsum("nec,nd->ecd", disp, xf)
            h = nn.gelu(jnp.einsum("ehd,ecd->ech", w1, xe))
            ye = jnp.einsum("edh,ech->ecd", w2, h) + b2[:, None, :]
            y = jnp.einsum("nec,ecd->nd", disp, ye)
        elif self.dispatch == "gather":
            w1_t = w1[eid]  # (N, H, D)
            h = nn.gelu(jnp.einsum("nhd,nd->nh", w1_t, xf))
            y = jnp.einsum("noh,nh->no", w2[eid], h) + b2[eid]
        else:
            raise ValueError(f"unknown dispatch {self.dispatch!r}")
        return y.reshape(orig_shape[:-1] + (d,))


from functools import partial


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def router_topk(z, k: int, tau: float):
    topv, topi = jax.lax.top_k(z, k)
    w = jax.nn.softmax(topv / (tau + 1e-8), axis=-1)
    return topi, w


def _router_fwd(z, k, tau):
    topv, topi = jax.lax.top_k(z, k)
    w = jax.nn.softmax(topv / (tau + 1e-8), axis=-1)
    return (topi, w), (topi, w, z.shape)


def _router_bwd(k, tau, res, grads):
    topi, w, z_shape = res
    _, grad_w = grads
    s = jnp.sum(grad_w * w, axis=-1, keepdims=True)
    grad_topv = (w * (grad_w - s)) / (tau + 1e-8)
    grad_z = jnp.zeros(z_shape, w.dtype)
    grad_z = grad_z.at[jnp.arange(z_shape[0])[:, None], topi].add(grad_topv)
    return (grad_z,)


router_topk.defvjp(_router_fwd, _router_bwd)


def _apply_mixture(x, topi, weights, w):
    """Sum_k w_k * W[topi_k] @ x per token (RMLP.py:765-799)."""
    n, k = topi.shape
    xk = x[:, None, :] * weights[:, :, None]          # (N, k, in)
    w_sel = w[topi]                                    # (N, k, out, in)
    return jnp.einsum("nkoi,nki->no", w_sel, xk)


def _apply_bias(topi, weights, b):
    return jnp.einsum("nko,nk->no", b[topi], weights)


class FastLearnedCellX3(nn.Module):
    """Tape-addressed mixture cell (RMLP.py:825-906)."""

    hidden: int
    d_out: int
    l_w1: int = 12
    l_w2: int = 12
    l_b2: int = 12
    k1: int = 3
    k2: int = 3
    k3: int = 3
    tau: float = 1.0
    d_addr: int = 32
    seed: int = 0  # fixed address-projection seed; give each instance its
    # own (the reference draws fresh torch randomness per instance, so two
    # stacked cells must not share routing geometry)

    @nn.compact
    def __call__(self, x):
        orig = x.shape
        d_in = x.shape[-1]
        xf = x.reshape(-1, d_in)

        rng = np.random.default_rng(self.seed)
        p = jnp.asarray(rng.normal(size=(d_in, self.d_addr)) / math.sqrt(d_in), x.dtype)

        def init_u(key, shape):
            u = jax.random.normal(key, shape)
            u = u - jnp.mean(u, axis=1, keepdims=True)
            return u / (jnp.linalg.norm(u, axis=1, keepdims=True) + 1e-8)

        u1 = self.param("U1", init_u, (self.l_w1, self.d_addr))
        u2 = self.param("U2", init_u, (self.l_w2, self.d_addr))
        u3 = self.param("U3", init_u, (self.l_b2, self.d_addr))

        def init_tape(key, shape):
            w = jax.random.normal(key, shape)
            axes = tuple(range(1, w.ndim))
            return w / (jnp.sqrt(jnp.sum(w**2, axis=axes, keepdims=True)) + 1e-12)

        w1 = self.param("W1", init_tape, (self.l_w1, self.hidden, d_in))
        w2 = self.param("W2", init_tape, (self.l_w2, self.d_out, self.hidden))
        b2 = self.param("b2", init_tape, (self.l_b2, self.d_out))

        addr = xf @ p
        i1, g1 = router_topk(addr @ u1.T, self.k1, self.tau)
        i2, g2 = router_topk(addr @ u2.T, self.k2, self.tau)
        i3, g3 = router_topk(addr @ u3.T, self.k3, self.tau)

        h = nn.gelu(_apply_mixture(xf, i1, g1, w1))
        y = _apply_mixture(h, i2, g2, w2) + _apply_bias(i3, g3, b2)
        return y.reshape(orig[:-1] + (self.d_out,))
