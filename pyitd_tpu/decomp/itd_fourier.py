"""Sine-template ITD and the ITD-Fourier cascade.

Behavioral contract (``/root/reference/itd_fourier_decomposition.py``):

* C12 ``itd_sine_wrapper``: a descending frequency comb
  ``arange(2, sr/2 - 1, 96)[::-1]`` (first comb entry skipped — the
  reference loop starts at 1); for each frequency the knot *positions* are
  the zero crossings of a synthetic sine template (forced index 0, interior
  sign flips, one extrapolated tail knot) and the baseline is the native
  fast cubic tier; ``rotation = problem - baseline`` and the next problem is
  the baseline.
* C13 ``fourier_mode_decomposition_any``: isolate the FFT band between the
  argmins flanking the global spectrum peak (excluding DC / the halfway
  point), symmetric bins mirrored; returns zeros when the peaks degenerate.
  ``..._valid`` is the stricter 3-local-peak variant.
* C14 ``itd_fourier_decomposition``: alternate sift -> per-rotation mode
  extraction -> subtract -> re-sum until no rotation yields a mode; output
  interleaves accumulated modes and residual rotations.

TPU design: the template knot positions depend only on (sr, n) — they are
**static data**, precomputed host-side; the comb unrolls in Python and
each frequency runs the static fast path of ``template_fast_baseline``.
Because the knot grid of a sampled sine is (almost) EXACTLY periodic
(``q0 = 2f/gcd(2f,sr)`` crossings every ``span = sr/gcd(2f,sr)``
samples), both gathers of that path become one-hot matmuls on the MXU:
knot compaction is ``x``-windows times a static ``(2*span, q0)``
selection, and the whole spline evaluation collapses to TWO matmuls
``knot_windows @ WK + moment_windows @ WM`` whose static weight matrices
fold the per-sample interpolation coefficients into the selection
(``ops/cubic_baseline._template_period_plan``; the rare floating-point
sign flips near exact template zeros ride tiny exact patch lists).  Mode
extraction is fixed-shape rfft + masked argmax/argmin, vmapped across
rotations.  The reference's
float32 spectrum buffer (``np.complex64`` at
``itd_fourier_decomposition.py:180``) is widened to the input dtype —
documented delta (the narrow buffer only loses precision).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..ops.cubic_baseline import template_fast_baseline
from ..ops.mxu_fft import irfft_best, rfft_best

__all__ = [
    "sine_template_positions",
    "itd_sine_sift",
    "fourier_mode_any",
    "fourier_mode_valid",
    "cascade_iteration",
    "itd_fourier_decomposition",
    "itd_fourier_decomposition_lean",
]


def sine_template_positions(sample_rate: int, n: int):
    """Static knot-position buffers for the reference's frequency comb.

    Returns ``(positions[F, cap] int32, counts[F] int32, freqs[F])`` —
    zero-padded, computed with numpy at trace time (the templates depend
    only on the config, not the data)."""
    buf, counts, freqs = _sine_template_np(sample_rate, n)
    return jnp.asarray(buf), jnp.asarray(counts), freqs


from functools import lru_cache


@lru_cache(maxsize=None)
def _sine_template_np(sample_rate: int, n: int):
    """Pure-numpy (host) twin of :func:`sine_template_positions` — safe
    to call inside a jit trace (never creates jax values)."""
    duration = n / sample_rate
    freqs = np.arange(2, sample_rate // 2 - 1, 96)[::-1]
    freqs = freqs[1:]  # the reference's loop starts at index 1
    t = np.arange(0, duration, 1 / sample_rate)
    pos_list, counts = [], []
    for f in freqs:
        s = np.sin(2 * np.pi * f * t)
        # vectorized zero-crossing test, identical to the reference's
        # per-i loop `(s[i] > 0 > s[i+1]) or (s[i] < 0 < s[i+1])` over
        # i in [1, size-2] (a python loop here costs ~10 s per 1M-point
        # comb entry)
        si, sj = s[1:-1], s[2:]
        cross = ((si > 0) & (sj < 0)) | ((si < 0) & (sj > 0))
        p = [0] + (np.nonzero(cross)[0] + 1).tolist()
        # the reference extrapolates the final knot on a zero-filled int
        # buffer (find_extrema's `extrema[idx-1]*2 - extrema[idx-2]`); with
        # NO crossings idx-2 wraps to the buffer's trailing zero, so it
        # appends a degenerate 0 knot rather than crashing — mirrored here
        second_last = p[-2] if len(p) >= 2 else 0
        p.append(2 * p[-1] - second_last)
        pos_list.append(np.asarray(p, np.int64))
        counts.append(len(p))
    cap = max(counts) + 2
    buf = np.zeros((len(freqs), cap), np.int32)
    for i, p in enumerate(pos_list):
        buf[i, : p.size] = p
    return buf, np.asarray(counts, np.int32), freqs


@lru_cache(maxsize=None)
def _sine_template_static(sample_rate: int, n: int):
    """Host-side (numpy) template buffers per comb frequency, untrimmed:
    list of ``(positions int64[count+...], count int, period_hint)`` —
    feeds the static fast path of ``template_fast_baseline``.

    ``period_hint = (q0, span)``: zero crossings of ``sin(2*pi*f*t)`` on
    the integer sample grid repeat every ``span = sr/g`` samples with
    ``q0 = 2f/g`` crossings per period (``g = gcd(2f, sr)``) — the
    candidate for the periodic matmul path, VERIFIED against the actual
    buffer by ``_template_period_plan`` before use (floating-point sign
    flips near exact zeros can break exact periodicity)."""
    from math import gcd

    pos_np, cnt_np, freqs = _sine_template_np(sample_rate, n)
    out = []
    for i, f in enumerate(freqs):
        g = gcd(2 * int(f), int(sample_rate))
        hint = (2 * int(f) // g, int(sample_rate) // g)
        out.append((pos_np[i], int(cnt_np[i]), hint))
    return out


def itd_sine_sift(x: jax.Array, sample_rate: int):
    """C12: returns ``(rotations[F, ..., n], residual)`` — the reference's
    ``products`` list is rotations + final problem.

    Batched layout: for input ``(..., n)`` the rotations stack as
    ``(F, ..., n)`` — the frequency axis LEADS.  (Changed in round 4:
    the old vmap path emitted ``(batch, F, n)``; the documented
    ``(F, ..., n)`` contract is now pinned by a test.)

    The comb is unrolled in Python: template positions are pure config,
    so each frequency runs the STATIC fast path (one row gather + baked
    per-sample coefficients; buffers trimmed to its own knot count)
    instead of a lax.scan step padded to the densest comb entry."""
    templates = _sine_template_static(sample_rate, x.shape[-1])
    problem = x
    rotations = []
    for pos_np, cnt, hint in templates:
        baseline = template_fast_baseline(problem, pos_np, cnt,
                                          period_hint=hint)
        rotations.append(problem - baseline)
        problem = baseline
    return jnp.stack(rotations, axis=0), problem


def _band_weights(x_rfft: jax.Array, mina: jax.Array,
                  minb: jax.Array, ok: jax.Array) -> jax.Array:
    """Per-bin HALF-spectrum weights reproducing the reference's
    ``real(ifft(masked full spectrum))`` — with ``xn[mina:minb] = x[...]``
    and the mirror ``xn[-minb:-mina]`` (empty when ``mina == 0``): folding
    the mirror onto the positive bins gives
    ``0.5*(1[k in [mina,minb)) + 1[mina>0]*1[k in (mina,minb]])`` with the
    DC bin restored to full weight (``real(V[0])``), so one ``irfft`` of
    ``x_rfft * w`` replaces the full complex ``ifft`` (half the FFT work).
    This reproduces the reference's endpoint-half-amplitude and
    mina==0-half-amplitude quirks exactly
    (``itd_fourier_decomposition.py:186-207``)."""
    bins = lax.broadcasted_iota(jnp.int32, x_rfft.shape, x_rfft.ndim - 1)
    a = mina[..., None]
    b = minb[..., None]
    in_main = (bins >= a) & (bins < b)
    in_mirror = (bins > a) & (bins <= b) & (a > 0)
    w = 0.5 * (in_main.astype(jnp.float32) + in_mirror.astype(jnp.float32))
    # DC never has a mirror partner: real(V[0]) keeps full weight
    w = jnp.where((bins == 0) & in_main, 1.0, w)
    return jnp.where(ok[..., None], w, jnp.zeros_like(w))


def _band_isolate(x_rfft: jax.Array, n: int, mina: jax.Array,
                  minb: jax.Array, ok: jax.Array) -> jax.Array:
    return irfft_best(x_rfft * _band_weights(x_rfft, mina, minb, ok), n)


def _mode_weights_any(x_rfft: jax.Array, n: int) -> jax.Array:
    """Peak search + band weights of ``fourier_mode_decomposition_any``
    on a precomputed half spectrum — batch-safe (all reductions on the
    last axis), shared by :func:`fourier_mode_any` (which applies the
    weights and irffts per rotation) and :func:`cascade_iteration`
    (which sums the weighted spectra first and irffts ONCE)."""
    a = jnp.abs(x_rfft)
    half = n // 2
    bins = lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)

    in_half = (bins >= 1) & (bins < half)
    peak_max = jnp.argmax(jnp.where(in_half, a, -jnp.inf), axis=-1).astype(jnp.int32)
    ok = (peak_max != 1) & (peak_max != half - 1)

    first_peak = jnp.argmax(
        jnp.where(bins < peak_max[..., None], a, -jnp.inf), axis=-1
    ).astype(jnp.int32)
    after = (bins > peak_max[..., None]) & (bins < half)
    last_peak = jnp.argmax(jnp.where(after, a, -jnp.inf), axis=-1).astype(jnp.int32)

    ok &= (first_peak != peak_max - 1) & (last_peak != peak_max + 1)

    # mina = argmin over [first_peak, peak_max]; minb over [peak_max, last_peak]
    sel_a = (bins >= first_peak[..., None]) & (bins <= peak_max[..., None])
    mina = jnp.argmin(jnp.where(sel_a, a, jnp.inf), axis=-1).astype(jnp.int32)
    sel_b = (bins >= peak_max[..., None]) & (bins <= last_peak[..., None])
    minb = jnp.argmin(jnp.where(sel_b, a, jnp.inf), axis=-1).astype(jnp.int32)

    return _band_weights(x_rfft, mina, minb, ok)


@jax.jit
def fourier_mode_any(rotation: jax.Array) -> jax.Array:
    """C13 ``fourier_mode_decomposition_any``
    (itd_fourier_decomposition.py:171-209).  All spectral work runs on
    the rfft half spectrum (the input is real; the reference's full-fft
    peak search only reads bins below n//2 anyway)."""
    n = rotation.shape[-1]
    x = rfft_best(rotation)
    return irfft_best(x * _mode_weights_any(x, n), n)


def _mode_weights_valid(x_rfft: jax.Array, n: int) -> jax.Array:
    """Strict-variant twin of :func:`_mode_weights_any`
    (itd_fourier_decomposition.py:131-168): needs >= 3 strict local
    spectrum peaks; uses the closest valid peaks around the maximum."""
    a = jnp.abs(x_rfft)
    half = n // 2
    bins = lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)

    a_m1 = jnp.concatenate([jnp.full_like(a[..., :1], jnp.inf), a[..., :-1]], axis=-1)
    a_p1 = jnp.concatenate([a[..., 1:], jnp.full_like(a[..., :1], jnp.inf)], axis=-1)
    is_peak = (a > a_m1) & (a > a_p1) & (bins >= 1) & (bins < half - 1)
    npeaks = jnp.sum(is_peak, axis=-1)

    peak_val = jnp.where(is_peak, a, -jnp.inf)
    peak_max = jnp.argmax(peak_val, axis=-1).astype(jnp.int32)

    before = is_peak & (bins < peak_max[..., None] - 1)
    after = is_peak & (bins > peak_max[..., None] + 1)
    first_peak = jnp.max(jnp.where(before, bins, -1), axis=-1).astype(jnp.int32)
    last_peak = jnp.min(jnp.where(after, bins, n), axis=-1).astype(jnp.int32)
    ok = (npeaks >= 3) & (first_peak >= 0) & (last_peak < n)

    fp = jnp.maximum(first_peak, 0)
    lp = jnp.minimum(last_peak, n - 1)
    sel_a = (bins >= fp[..., None]) & (bins <= peak_max[..., None])
    mina = jnp.argmin(jnp.where(sel_a, a, jnp.inf), axis=-1).astype(jnp.int32)
    sel_b = (bins >= peak_max[..., None]) & (bins <= lp[..., None])
    minb = jnp.argmin(jnp.where(sel_b, a, jnp.inf), axis=-1).astype(jnp.int32)

    return _band_weights(x_rfft, mina, minb, ok)


@jax.jit
def fourier_mode_valid(rotation: jax.Array) -> jax.Array:
    """C13 strict variant (itd_fourier_decomposition.py:131-168).  Runs
    on the rfft half spectrum (see fourier_mode_any)."""
    n = rotation.shape[-1]
    x = rfft_best(rotation)
    return irfft_best(x * _mode_weights_valid(x, n), n)


@partial(jax.jit, static_argnums=(1,), static_argnames=("mode",))
def cascade_iteration(current: jax.Array, sample_rate: int, *, mode="any"):
    """One fused ITD-Fourier cascade iteration
    (itd_fourier_decomposition.py:212-255 loop body) with the per-rotation
    inverse FFTs collapsed to ONE.

    The reference's body subtracts each extracted mode from its rotation
    and re-sums ``sum(rotations) + residual``.  Both steps are linear and
    the rotations telescope (``rot_i = problem_i - baseline_i``,
    ``residual = baseline_last``), so the update is exactly
    ``current - sum_i(mode_i)`` — and since every mode is
    ``irfft(V_i * w_i)``, the sum of modes is ``irfft(sum_i V_i * w_i)``:
    one inverse transform instead of F of them (the F-rotation comb pays
    10 rfft + 1 irfft per iteration instead of 10 + 10).

    Returns ``(new_current, is_mode[F], mode_spectra[F, n//2+1],
    rotations[F, n], residual[n])`` — mode_spectra are the weighted half
    spectra; materialize any subset later with one batched
    ``jnp.fft.irfft``.  Unused outputs are dead-code-eliminated under jit
    (the bench chains only ``new_current``).

    Documented delta vs the unfused body: the keep decision is spectral
    (``any(V*w != 0)``) instead of time-domain ``~all(isclose(mode, 0))``
    — they differ only for a band whose time signal is uniformly below
    1e-8 yet not exactly zero, which requires the rotation itself to be
    at the noise floor; and the fp rounding of the update differs at
    accumulation-order level (~1 ulp), covered by the parity test."""
    n = current.shape[-1]
    weights_fn = _mode_weights_any if mode == "any" else _mode_weights_valid
    rotations, residual = itd_sine_sift(current, sample_rate)
    spectra = rfft_best(rotations)
    mode_spectra = spectra * weights_fn(spectra, n)
    is_mode = jnp.any(mode_spectra != 0, axis=-1)
    new_current = current - irfft_best(jnp.sum(mode_spectra, axis=0), n)
    return new_current, is_mode, mode_spectra, rotations, residual


class CascadeResult(NamedTuple):
    components: jax.Array  # (n_out, n): interleaved [modes_i..., rotation_i]... residual
    n_iterations: int
    n_modes: int


def itd_fourier_decomposition(signal, sample_rate: int, *, max_outer: int = 50,
                              mode="any") -> list:
    """C14 cascade (itd_fourier_decomposition.py:212-255): returns the list
    [modes for rot 0, rotation 0, modes for rot 1, rotation 1, ..., residual].

    The outer loop is host-driven (its trip count is data-dependent and
    small); each iteration is ONE fused jitted kernel
    (:func:`cascade_iteration` — sift, batched rfft, band weights, a
    single summed irfft).  Kept modes are stored as weighted half
    spectra and materialized with one batched irfft at termination.
    ``max_outer`` bounds runaway cascades (the reference loops unboundedly).
    """
    x = jnp.asarray(signal)
    n = x.shape[-1]

    mode_specs: list = []
    source_indices: list = []
    current = x
    it = 0
    while it < max_outer:
        it += 1
        current_next, is_mode, spectra, rotations, residual = cascade_iteration(
            current, sample_rate, mode=mode)
        keep = np.asarray(is_mode)
        if not keep.any():
            out = []
            rot_np = np.asarray(rotations)
            modes_np = (np.asarray(jnp.fft.irfft(jnp.stack(mode_specs), n=n))
                        if mode_specs else None)
            for i in range(rot_np.shape[0]):
                for m_idx, s_idx in enumerate(source_indices):
                    if s_idx == i:
                        out.append(modes_np[m_idx])
                out.append(rot_np[i])
            out.append(np.asarray(residual))
            return out
        for i in range(keep.shape[0]):
            if keep[i]:
                mode_specs.append(spectra[i])
                source_indices.append(i)
        current = current_next
    raise RuntimeError(f"cascade did not converge in {max_outer} iterations")


def itd_fourier_decomposition_lean(signal, sample_rate: int, *, max_outer: int = 50,
                                   mode="any"):
    """C14 lean variant (itd_fourier_decomposition.py:258-303): one
    accumulated mode array per rotation; output alternates
    [modes_i, rotation_i, ...] then the residual.  (The reference calls an
    undefined ``itd_fourier_wrapper`` here — the sine wrapper renamed; fixed
    in this rebuild, as SURVEY.md prescribes.)

    Rides :func:`cascade_iteration`: the per-rotation mode accumulators
    live in the spectral domain (accumulation is linear) and are
    materialized with ONE batched irfft at termination."""
    x = jnp.asarray(signal)
    n = x.shape[-1]

    acc_spec = None
    current = x
    it = 0
    while it < max_outer:
        it += 1
        current_next, is_mode, spectra, rotations, residual = cascade_iteration(
            current, sample_rate, mode=mode)
        if not bool(np.asarray(is_mode).any()):
            acc = (np.asarray(jnp.fft.irfft(acc_spec, n=n))
                   if acc_spec is not None
                   else np.zeros(rotations.shape, np.asarray(residual).dtype))
            out = []
            rot_np = np.asarray(rotations)
            for i in range(rot_np.shape[0]):
                out.append(acc[i])
                out.append(rot_np[i])
            out.append(np.asarray(residual))
            return out
        acc_spec = spectra if acc_spec is None else acc_spec + spectra
        current = current_next
    raise RuntimeError(f"cascade did not converge in {max_outer} iterations")
