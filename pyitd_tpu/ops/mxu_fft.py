"""MXU-native FFT: the Bailey four-step factorization as two complex
matmuls, for power-of-two lengths.

Why: XLA's TPU FFT runs on the VPU; an 8x1M f32 rfft measures ~0.7 ms
per transform on v5e — ~17x off the HBM roofline for what is, at these
sizes, a bandwidth-light op.  The EFD and ITD-Fourier configs are
FFT-floor-bound (COVERAGE.md round-5).  Factoring N = N1*N2 turns the
DFT into

    A[n1, n2] = x[n1*N2 + n2]
    A1 = W1 @ A            (W1[k1,n1] = exp(-2j*pi*k1*n1/N1))
    A2 = A1 * T            (T[k1,n2]  = exp(-2j*pi*k1*n2/N))
    A3 = A2 @ W2           (W2[n2,k2] = exp(-2j*pi*n2*k2/N2))
    X[k2*N1 + k1] = A3[k1, k2]

— two (batched) complex matmuls that run on the MXU at ~17 GFlop per
1M-point complex transform, plus one cheap transpose.  Real transforms
use the standard even/odd complex packing (a length-N real FFT rides a
length-N/2 complex FFT + an elementwise unpack), halving the matmul
work again.

Accuracy: matmul-DFT error grows as ~sqrt(N1)*eps per stage.  At
precision='highest' (f32 accumulation) the 1M-point roundtrip error vs
a numpy f64 oracle is the same order as XLA's own f32 FFT (pinned in
tests/test_mxu_fft.py); 'default' (bf16 inputs) is NOT acceptable for
the decomposition tiers and is rejected.

The reference has no FFT implementation of its own — it calls numpy
(`/root/reference/EFD.py`, `itd_fourier_decomposition.py`); this module
is the TPU-native replacement for those call sites.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fft_mxu", "ifft_mxu", "rfft_mxu", "irfft_mxu",
           "use_mxu_fft", "rfft_best", "irfft_best"]


def use_mxu_fft(n: int, dtype) -> bool:
    """Trace-time dispatch policy for the decomposition tiers: ride the
    MXU four-step on TPU-class backends for power-of-two f32 lengths
    >= 2^14 (below that the matmuls don't fill the MXU and XLA's FFT is
    already sub-100us); XLA's FFT everywhere else.  f64 pipelines always
    take XLA's FFT (the four-step constants are complex64).

    ``PYITD_MXU_FFT=0`` forces XLA; ``=1`` forces the MXU path wherever
    the shape is eligible (any backend — used by the CPU wiring tests).
    """
    import os

    if n < (1 << 14) or (n & (n - 1)):
        return False
    if jnp.dtype(dtype) not in (jnp.dtype(jnp.float32),
                                jnp.dtype(jnp.complex64)):
        return False
    env = os.environ.get("PYITD_MXU_FFT")
    if env is not None:
        return env == "1"
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:  # no backend yet
        return False
    return platform in ("tpu", "axon")


def _precision() -> str:
    import os

    return os.environ.get("PYITD_MXU_FFT_PRECISION", "highest")


def rfft_best(x: jax.Array) -> jax.Array:
    """``jnp.fft.rfft`` or the MXU four-step, by :func:`use_mxu_fft`."""
    if use_mxu_fft(x.shape[-1], x.dtype):
        return rfft_mxu(x, precision=_precision())
    return jnp.fft.rfft(x)


def irfft_best(xf: jax.Array, n: int) -> jax.Array:
    """``jnp.fft.irfft(xf, n=n)`` or the MXU four-step."""
    if use_mxu_fft(n, xf.dtype):
        return irfft_mxu(xf, n, precision=_precision())
    return jnp.fft.irfft(xf, n=n)


def _split(n: int) -> tuple[int, int]:
    """N = N1*N2 with N1 the larger power-of-two half (matmul shapes
    (N1,N1) and (N2,N2) both land on full MXU tiles for N >= 2^16)."""
    if n & (n - 1) or n < 4:
        raise ValueError(f"mxu_fft requires a power-of-two length >= 4, got {n}")
    lg = n.bit_length() - 1
    n1 = 1 << ((lg + 1) // 2)
    return n1, n // n1


@lru_cache(maxsize=None)
def _plan(n: int, inverse: bool):
    """Host-side twiddle constants (numpy, f64 phases -> complex64)."""
    n1, n2 = _split(n)
    sgn = 2j if inverse else -2j
    k1 = np.arange(n1)
    k2 = np.arange(n2)
    w1 = np.exp(sgn * np.pi * np.outer(k1, k1) / n1)
    w2 = np.exp(sgn * np.pi * np.outer(k2, k2) / n2)
    tw = np.exp(sgn * np.pi * np.outer(k1, k2) / n)
    c = np.complex64
    return n1, n2, w1.astype(c), w2.astype(c), tw.astype(c)


def _four_step(z: jax.Array, n: int, inverse: bool, precision) -> jax.Array:
    n1, n2, w1, w2, tw = _plan(n, inverse)
    a = z.reshape(z.shape[:-1] + (n1, n2))
    a = jnp.einsum("ij,...jk->...ik", jnp.asarray(w1), a,
                   precision=precision)
    a = a * jnp.asarray(tw)
    a = jnp.einsum("...ij,jk->...ik", a, jnp.asarray(w2),
                   precision=precision)
    # X[k2*N1 + k1] = A3[k1, k2]
    out = jnp.swapaxes(a, -1, -2).reshape(z.shape[:-1] + (n,))
    return out


@partial(jax.jit, static_argnames=("precision",))
def fft_mxu(z: jax.Array, *, precision: str = "highest") -> jax.Array:
    """Complex DFT of the last axis (power-of-two length) on the MXU."""
    z = jnp.asarray(z, jnp.complex64)
    return _four_step(z, z.shape[-1], inverse=False, precision=precision)


@partial(jax.jit, static_argnames=("precision",))
def ifft_mxu(z: jax.Array, *, precision: str = "highest") -> jax.Array:
    """Inverse complex DFT (unnormalized forward conjugate / N)."""
    z = jnp.asarray(z, jnp.complex64)
    n = z.shape[-1]
    return _four_step(z, n, inverse=True, precision=precision) / n


@lru_cache(maxsize=None)
def _half_twiddle(n: int):
    """exp(-2j*pi*k/N) for k = 0..N/2 (the rfft unpack phases)."""
    k = np.arange(n // 2 + 1)
    return np.exp(-2j * np.pi * k / n).astype(np.complex64)


@partial(jax.jit, static_argnames=("precision",))
def rfft_mxu(x: jax.Array, *, precision: str = "highest") -> jax.Array:
    """Real-input FFT of the last axis -> N/2+1 half spectrum, matching
    ``jnp.fft.rfft`` for power-of-two N: even/odd packing, one length-N/2
    complex four-step, standard unpack."""
    x = jnp.asarray(x)
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        raise ValueError("rfft_mxu takes a real array")
    n = x.shape[-1]
    h = n // 2
    z = x[..., 0::2] + 1j * x[..., 1::2].astype(jnp.float32)
    zf = _four_step(z.astype(jnp.complex64), h, inverse=False,
                    precision=precision)
    # Z extended periodically: Z[h] = Z[0]; rev[k] = Z[(-k) mod h]
    zf_ext = jnp.concatenate([zf, zf[..., :1]], axis=-1)
    rev = jnp.flip(zf_ext, axis=-1)
    even = 0.5 * (zf_ext + jnp.conj(rev))
    odd = -0.5j * (zf_ext - jnp.conj(rev))
    return even + jnp.asarray(_half_twiddle(n)) * odd


@partial(jax.jit, static_argnames=("n", "precision"))
def irfft_mxu(xf: jax.Array, n: int, *, precision: str = "highest") -> jax.Array:
    """Inverse of :func:`rfft_mxu` -> length-``n`` real signal, matching
    ``jnp.fft.irfft(xf, n=n)`` for power-of-two ``n``."""
    xf = jnp.asarray(xf, jnp.complex64)
    h = n // 2
    if xf.shape[-1] != h + 1:
        raise ValueError(f"irfft_mxu: spectrum has {xf.shape[-1]} bins, "
                         f"expected n//2+1 = {h + 1}")
    rev = jnp.flip(xf, axis=-1)  # rev[k] = X[h - k] = conj(X[(-k) mod n]) half
    even = 0.5 * (xf + jnp.conj(rev))
    odd = 0.5 * (xf - jnp.conj(rev)) * jnp.conj(jnp.asarray(_half_twiddle(n)))
    z = (even + 1j * odd)[..., :h]
    zt = _four_step(z, h, inverse=True, precision=precision) / h
    out = jnp.stack([jnp.real(zt), jnp.imag(zt)], axis=-1)
    return out.reshape(xf.shape[:-1] + (n,))
