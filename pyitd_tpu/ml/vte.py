"""Vector transport / manifold "BlockFast" toolkit (``/root/reference/VTE.py``).

JAX ports of the attention-free architecture's building blocks:

* :func:`pairwise_rot_spiral` / :func:`spiral_mix` — pairwise 2-D rotations
  with a radial Euler step toward a shell (``VTE.py:14-93``);
* :func:`phase_tap` — guarded-Householder phase-preserving difference
  (``VTE.py:94-193``): reflect H with ``H a = u`` applied to
  ``x_t - x_{t-d}``, identity/fixed-axis fallbacks near ``u = ±a`` and tiny
  norms;
* :func:`phase_transport` — Rodrigues-style parallel transport of the
  lagged difference from direction v to u, with antipodal and degenerate
  guards (``VTE.py:195-326``);
* :func:`subspace_iteration` — deterministic block-Krylov subspace
  extraction with the Student-t spectral filter (``VTE.py:347-404``), plus
  :func:`orthonorm_columns`, :func:`sign_align`, :func:`energy_normalize`,
  :func:`soft_shrink` and the :class:`LowRankShift` module;
* :func:`frft_time` — chirp-convolution fractional Fourier transform along
  time (``VTE.py:582-673``).

Branchless TPU style: the reference's boolean-indexed guard branches become
``where`` selects.  The full ManifoldAttentionNoAttn stages
(:class:`ManifoldStage`) and the GPT wrapper (:class:`BlockFastGPT`)
assemble from these pieces further down in this module.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pairwise_rot_spiral",
    "spiral_mix",
    "phase_tap",
    "phase_transport",
    "orthonorm_columns",
    "subspace_iteration",
    "sign_align",
    "energy_normalize",
    "soft_shrink",
    "LowRankShift",
    "frft_time",
    "subspace_iteration_linop",
    "ManifoldStage",
    "AutoencoderBlock",
    "BlockFastGPT",
    "dynmix",
    "ar1_filter",
]


def pairwise_rot_spiral(x, radius=6.0, omega=1.0, k=1.0, step=0.1, cube_shell=False):
    d = x.shape[-1]
    eps = 1e-8
    r = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    radial = (radius - r) * (x / r)

    if d >= 2:
        c, s = math.cos(omega * step), math.sin(omega * step)
        n2 = d // 2
        head = x[..., : 2 * n2].reshape(x.shape[:-1] + (n2, 2))
        xi, xj = head[..., 0], head[..., 1]
        rot = jnp.stack([c * xi - s * xj, s * xi + c * xj], axis=-1).reshape(
            x.shape[:-1] + (2 * n2,)
        )
        y = jnp.concatenate([rot, x[..., 2 * n2 :]], axis=-1) if d % 2 else rot
    else:
        y = x

    y = x + step * ((y - x) + k * radial)
    if cube_shell:
        y = radius * jnp.tanh(y / radius)
    return y


def spiral_mix(comps, center=0.0, loop_iters=2, **spiral_kwargs):
    y = comps
    for _ in range(loop_iters):
        y = pairwise_rot_spiral(y - center, **spiral_kwargs) + center
    return y


def _safe_unit(v, eps=1e-12):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def phase_tap(x, d: int, tau: float = 1e-6):
    """(B, T, C) -> (B, T, C); early rows are a/(d-t), later rows the
    Householder-transported lagged difference."""
    b, t, c = x.shape
    a = jnp.zeros((c,), x.dtype).at[0].set(1.0)
    tt = jnp.arange(t)

    early = (a[None, None, :] / jnp.maximum(d - tt, 1)[None, :, None].astype(x.dtype))
    early = jnp.where((tt < d)[None, :, None], early, 0.0)
    if t <= d:
        return early

    x_t = x[:, d:, :]
    x_tm = x[:, :-d, :]
    u = _safe_unit(x_t)
    v = x_t - x_tm

    dot = jnp.sum(a * u, axis=-1, keepdims=True)
    near_pos = dot > 1.0 - tau
    near_neg = dot < -1.0 + tau
    near_zero = jnp.linalg.norm(u, axis=-1, keepdims=True) < tau

    w = _safe_unit(a - u)
    y_gen = v - 2.0 * w * jnp.sum(w * v, axis=-1, keepdims=True)
    if c == 1:
        y_neg = -v
    else:
        bb = jnp.zeros((c,), x.dtype).at[1].set(1.0)
        y_neg = v - 2.0 * bb * jnp.sum(bb * v, axis=-1, keepdims=True)

    y_main = jnp.where(near_pos | near_zero, v, jnp.where(near_neg, y_neg, y_gen))
    if c == 1:
        y_main = v
    pad = jnp.zeros((b, d, c), x.dtype)
    return early + jnp.concatenate([pad, y_main], axis=1) * (~(tt < d))[None, :, None]


def phase_transport(x, d: int, tau: float = 1e-6):
    """Rodrigues transport of lagged differences (VTE.py:222-326)."""
    b, t, c = x.shape
    ref_t = min(d, t - 1)
    u_ref = _safe_unit(x[:, ref_t, :])
    tt = jnp.arange(t)
    early = u_ref[:, None, :] / jnp.maximum(d - tt, 1)[None, :, None].astype(x.dtype)
    early = jnp.where((tt < d)[None, :, None], early, 0.0)
    if t <= d:
        return early

    xt = x[:, d:, :]
    xtm = x[:, :-d, :]
    u = _safe_unit(xt)
    v = _safe_unit(xtm)
    w = xt - xtm

    cth = jnp.sum(u * v, axis=-1, keepdims=True)
    near_pos = cth > 1.0 - tau
    near_neg = cth < -1.0 + tau
    small_u = jnp.linalg.norm(xt, axis=-1, keepdims=True) < tau
    small_v = jnp.linalg.norm(xtm, axis=-1, keepdims=True) < tau
    trivial = near_pos | small_u | small_v

    alpha = 1.0 / jnp.maximum(1.0 + cth, tau)
    av = jnp.sum(v * w, axis=-1, keepdims=True)
    bu = jnp.sum(u * w, axis=-1, keepdims=True)
    kw = u * av - v * bu
    k2w = u * (av * cth - bu) + v * (bu * cth - av)
    y_gen = w - kw + alpha * k2w

    # antipodal: reflect across v and an orthonormal perp of v
    idx = jnp.argmin(jnp.abs(v), axis=-1, keepdims=True)
    e = jax.nn.one_hot(idx[..., 0], c, dtype=x.dtype)
    p = e - jnp.sum(e * v, axis=-1, keepdims=True) * v
    p = _safe_unit(p)
    y_neg = (
        w
        - 2.0 * jnp.sum(v * w, axis=-1, keepdims=True) * v
        - 2.0 * jnp.sum(p * w, axis=-1, keepdims=True) * p
    )

    y_main = jnp.where(trivial, w, jnp.where(near_neg, y_neg, y_gen))
    pad = jnp.zeros((b, d, c), x.dtype)
    return early + jnp.concatenate([pad, y_main], axis=1) * (~(tt < d))[None, :, None]


def orthonorm_columns(v, eps: float = 1e-6):
    q, r = jnp.linalg.qr(v)
    diag = jnp.diagonal(r, axis1=-2, axis2=-1)
    return q * jnp.sign(diag + eps)[..., None, :]


def subspace_iteration(cmat, r: int, k: int, v0=None, eps: float = 1e-6):
    """Block-Krylov subspace with a Student-t spectral filter
    (VTE.py:347-404).  cmat: (B, D, D) -> (B, D, r)."""
    bsz, d, _ = cmat.shape
    if v0 is None:
        v0 = jnp.broadcast_to(jnp.eye(d, r, dtype=cmat.dtype)[None], (bsz, d, r))
    v = orthonorm_columns(v0, eps)
    blocks = []
    z = v
    for _ in range(max(1, k)):
        blocks.append(z)
        z = orthonorm_columns(cmat @ z, eps)
    q = orthonorm_columns(jnp.concatenate(blocks, axis=2), eps)

    h = jnp.swapaxes(q, 1, 2) @ (cmat @ q)
    evals, u = jnp.linalg.eigh(h)
    kappa = jnp.quantile(jnp.maximum(evals, eps), 0.80, axis=-1, keepdims=True) + eps
    nu = 4.0
    gt = 1.0 - jnp.power(1.0 + evals / kappa, -0.5 * nu)
    scores = jnp.power(jnp.maximum(evals, eps), 0.5) * gt
    idx = jnp.argsort(-scores, axis=-1)[..., :r]
    u_top = jnp.take_along_axis(u, idx[:, None, :], axis=2)
    return orthonorm_columns(q @ u_top, eps)


def sign_align(v, a, eps: float = 1e-12):
    dots = jnp.sum(v * a[..., None], axis=1)
    return v * jnp.sign(dots + eps)[:, None, :]


def energy_normalize(traces, eps: float = 1e-8):
    scales = jnp.sqrt(jnp.sum(traces**2, axis=1, keepdims=True) + eps)
    return traces / scales, scales


def soft_shrink(x, lam: float):
    if lam <= 0.0:
        return x
    return jnp.sign(x) * jax.nn.gelu(jnp.abs(x) - lam)


class LowRankShift(nn.Module):
    """S(X) = out(gelu(in(X))) low-rank residual shift (VTE.py:438-460)."""

    shift_rank: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        z = nn.Dense(self.shift_rank, use_bias=False)(x)
        return nn.Dense(d, use_bias=True)(nn.gelu(z))


def frft_time(z, alpha: float, *, t_min: float = -1.0, t_max: float = 1.0, eps: float = 1e-7):
    """Fractional Fourier transform along axis 1 (chirp convolution)."""
    zc = z.astype(jnp.complex128 if z.dtype == jnp.float64 else jnp.complex64) \
        if not jnp.iscomplexobj(z) else z
    t_len = zc.shape[1]
    tail = zc.shape[2:]

    a = ((float(alpha) + math.pi) % (2.0 * math.pi)) - math.pi
    if abs(a) < 1e-6:
        return zc
    if abs(abs(a) - math.pi) < 1e-6:
        phase = np.exp(1j * math.copysign(math.pi / 2, a))
        return phase * jnp.flip(zc, axis=1)

    s = math.copysign(1.0 / max(eps, abs(math.sin(a))), math.sin(a))
    # DELIBERATE deviation from VTE.py:626, which floors NEGATIVE sines at
    # +eps (`cos(a)/max(eps, sin(a))`), turning cot into ~1/eps for every
    # inverse transform (alpha < 0 — komega's frft_time(..., -alpha) hits
    # it on every call).  The resulting exp(i*pi*1e7*t^2) phases are pure
    # float-rounding chaos — not reproducible across platforms/dtypes —
    # so there is no meaningful behavior to preserve; the sign-preserving
    # guard below is what the adjacent csc line already does.
    c = math.cos(a) / math.copysign(max(eps, abs(math.sin(a))), math.sin(a))

    t = np.linspace(t_min, t_max, t_len)
    dt = (t_max - t_min) / (t_len - 1) if t_len > 1 else 1.0
    shape_tail = (1, t_len) + (1,) * len(tail)
    pre_post = jnp.asarray(
        np.exp(1j * np.pi * (c + s) * t**2).reshape(shape_tail), zc.dtype
    )
    g = zc * pre_post

    m = np.arange(-(t_len - 1), t_len)
    h = np.exp(-1j * np.pi * s * (m * dt) ** 2)
    ln = 1 << (2 * t_len - 2).bit_length()
    h_pad = np.zeros(ln, complex)
    h_pad[m % ln] = h
    pad = [(0, 0)] * zc.ndim
    pad[1] = (0, ln - t_len)
    g_pad = jnp.pad(g, pad)

    gf = jnp.fft.fft(g_pad, axis=1)
    hf = jnp.asarray(np.fft.fft(h_pad).reshape((1, ln) + (1,) * len(tail)), zc.dtype)
    conv = jnp.fft.ifft(gf * hf, axis=1)[:, t_len - 1 : 2 * t_len - 1]

    pref = np.sqrt(1.0 - 1j * c)
    return (pref * dt) * pre_post * conv


# ---------------------------------------------------------------------------
# ManifoldAttentionNoAttn stages + the BlockFast autoencoder GPT
# (VTE.py:477-581, 674-910)
# ---------------------------------------------------------------------------


def subspace_iteration_linop(matvec, v0, k: int, eps: float = 1e-6):
    """Power iteration over a linear operator with QR orthonormalization
    (VTE.py:461-476)."""
    v = orthonorm_columns(v0, eps)
    for _ in range(max(1, k)):
        v = orthonorm_columns(matvec(v), eps)
    return v


def ar1_filter(traces, rho: float):
    """Causal AR(1) smoothing along time via associative scan."""
    b, t, r = traces.shape
    a = jnp.full((b, t, r), rho, traces.dtype).at[:, 0, :].set(0.0)
    c = traces

    def combine(l, rr):
        al, cl = l
        ar_, cr = rr
        return al * ar_, ar_ * cl + cr

    _, y = jax.lax.associative_scan(combine, (a, c), axis=1)
    return y


class ManifoldStage(nn.Module):
    """Stages 1/2 of the no-attention manifold mixer.

    ``use_frft=True`` gives Stage1 (FrFT-energy-weighted Omega covariance,
    VTE.py:674-797); False gives Stage2 (plain covariance, VTE.py:477-581).
    """

    rank: int = 16
    k_iters: int = 2
    shift_rank: int = 0
    shrink_lambda: float = 0.0
    causal: bool = False
    ar_rho: float = 0.0
    eps: float = 1e-5
    use_layernorm: bool = True
    use_frft: bool = False
    n_alphas: int | None = None  # defaults to rank (the reference grid)

    @nn.compact
    def __call__(self, x):
        b, t, d = x.shape
        anchor = jnp.zeros((b, d), x.dtype).at[:, 0].set(1.0)
        xc = x - anchor[:, None, :]
        s = LowRankShift(self.shift_rank)(x) if self.shift_rank > 0 else None
        xprime = xc + s if s is not None else xc

        v0 = jnp.broadcast_to(jnp.eye(d, self.rank, dtype=x.dtype)[None], (b, d, self.rank))

        if self.use_frft:
            n_alpha = self.n_alphas or self.rank
            alphas = np.linspace(0.15, 2.99, n_alpha)
            weights = []
            for alpha in alphas:
                x_a = frft_time(xprime, float(alpha))
                e_a = jnp.mean(jnp.abs(x_a) ** 2, axis=2)
                w_a = jnp.power(e_a + 1e-6, 0.5)
                w_a = w_a / (jnp.mean(w_a, axis=1, keepdims=True) + 1e-6)
                weights.append((float(alpha), w_a))

            def komega(y):
                out = 0
                for alpha, w in weights:
                    y_a = frft_time(y, alpha)
                    out = out + frft_time(w[..., None] * y_a, -alpha)
                return (out / len(weights)).real.astype(x.dtype)

            def matvec(v):
                y = komega(xprime @ v)
                return jnp.swapaxes(xprime, 1, 2) @ y / t + self.eps * v
        else:
            def matvec(v):
                y = xprime @ v
                return jnp.swapaxes(xprime, 1, 2) @ y / t + self.eps * v

        v = subspace_iteration_linop(matvec, v0, self.k_iters, self.eps)
        v = sign_align(v, anchor)

        traces = xprime @ v
        traces_n, scales = energy_normalize(traces, self.eps)
        traces_n = soft_shrink(traces_n, self.shrink_lambda)
        traces_n = spiral_mix(traces_n, loop_iters=2)
        if self.causal and self.ar_rho > 0.0:
            traces_n = ar1_filter(traces_n, self.ar_rho)
        x_tilde = (traces_n * scales) @ jnp.swapaxes(v, 1, 2)

        x_hat = x_tilde + anchor[:, None, :]
        if s is not None:
            x_hat = x_hat - s
        y = x + nn.Dense(d, use_bias=False, name="out")(x_hat)
        if self.use_layernorm:
            y = nn.LayerNorm()(y)
        return y


class _Cell(nn.Module):
    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.gelu(nn.Dense(2 * d, use_bias=False, kernel_init=nn.initializers.he_uniform())(x))
        return nn.Dense(d, use_bias=True, kernel_init=nn.initializers.he_uniform())(h)


class AutoencoderBlock(nn.Module):
    """PhaseTransport front-end + encode -> stage1 -> stage2 -> decode
    (VTE.py:811-840)."""

    rank: int = 16

    @nn.compact
    def __call__(self, x):
        z = nn.LayerNorm()(x)
        z = z + phase_transport(z, 1)
        z1 = _Cell(name="enc1")(z)
        # n_alphas defaults to rank — the reference's fixed grid
        # (VTE.py:736 linspace(0.15, 2.99, steps=rank))
        z1 = ManifoldStage(rank=self.rank, k_iters=3, shift_rank=8,
                           shrink_lambda=0.01, use_frft=True,
                           name="convolve1")(z1)
        z1 = ManifoldStage(rank=self.rank, k_iters=2, shift_rank=8,
                           shrink_lambda=0.01, use_frft=False,
                           name="convolve2")(z1)
        z1 = _Cell(name="dec1")(z1)
        return x + z1


class BlockFastGPT(nn.Module):
    """The attention-free GPT wrapper (VTE.py:856-910): fixed zero-mean
    unit-norm embeddings, AutoencoderBlock stack, linear head."""

    vocab_size: int = 66
    n_embd: int = 128
    n_layer: int = 2
    rank: int = 16
    seed: int = 123

    @nn.compact
    def __call__(self, idx, targets=None):
        from .zoo import fixed_embedding

        wte = fixed_embedding(self.vocab_size, self.n_embd, self.seed)
        x = wte[idx]
        for i in range(self.n_layer):
            x = AutoencoderBlock(rank=self.rank, name=f"block_{i}")(x)
        logits = nn.Dense(self.vocab_size, use_bias=False, name="lm_head")(x)
        if targets is None:
            return logits[:, -1:], None
        valid = targets != -1
        onehot = jax.nn.one_hot(jnp.maximum(targets, 0), self.vocab_size)
        nll = -jnp.sum(onehot * jax.nn.log_softmax(logits), axis=-1)
        loss = jnp.sum(jnp.where(valid, nll, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
        return logits, loss


def dynmix(comps, step: float = 0.1, loop_iters: int = 2):
    """Cooperative symplectic mixer for >=3 tensors (AGI_(1).ipynb DynMix):
    each component takes a Heun step toward the mean of the others, gated by
    a sigmoid of their normalized inner product.  ``comps``: list of
    same-shaped arrays or a stacked array with the component axis first."""
    stacked = jnp.stack(comps, 0) if isinstance(comps, (list, tuple)) else comps
    n = stacked.shape[0]
    if n < 3:
        raise ValueError("Need at least 3 components")

    def coop(r, c):
        w = jax.nn.sigmoid(
            jnp.sum(r * c, axis=-1, keepdims=True) / (2.0 * r.shape[-1] ** 0.5)
        )
        k1 = w * (c - r)
        k2 = w * (c - (r + step * k1))
        return r + 0.5 * step * (k1 + k2)

    for _ in range(loop_iters):
        total = jnp.sum(stacked, axis=0, keepdims=True)
        others_mean = (total - stacked) / (n - 1)
        stacked = jax.vmap(coop)(stacked, others_mean)
    if isinstance(comps, (list, tuple)):
        return [stacked[i] for i in range(n)]
    return stacked
