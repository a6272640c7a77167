"""Empirical Fourier Decomposition family.

EFD (``/root/reference/EFD.py``): rfft -> top-N spectral maxima with a
plateau-rightmost dedup -> band bounds at the argmin between consecutive
maxima -> symmetric x2 mirror extension -> zero-one ideal filterbank
slicing (including the reference's "negative-frequency" tail slices, which
on an rfft array are really high-frequency bins — a quirk preserved
because band contents depend on it) -> irfft, center crop.

Modified EFD (``/root/reference/modified_efd.py``): the same segmentation
run in the time<->spectrum *flipped* domain (a spectrum row is treated as a
signal), greedy strongest-band extraction.

TPU design notes: everything is fixed-shape.  The requested band count
``n_bands`` is static; when fewer spectral peaks exist, trailing bands are
zero and ``count`` reports the actual number (the reference shrinks arrays
dynamically).  Dynamic slice bounds become masked selections over the full
bin axis.  Ties in the descending peak sort follow reversed-stable order
(deterministic; the reference uses an unstable quicksort whose tie order is
platform-dependent).  One degenerate reference corner is not reproduced: a
band bound of exactly 0 makes the reference's negative-index mirror slice
``[-0:]`` cover the whole spectrum; here it covers nothing.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.mxu_fft import irfft_best, rfft_best

__all__ = ["spectral_segments", "efd", "EFDResult", "efd_real", "iterative_efd", "efd_slice_max", "iterative_max"]


def _masked_argmin(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """argmin of x over [lo, hi) (per batch element), relative to 0."""
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    sel = (it >= lo[..., None]) & (it < hi[..., None])
    big = jnp.full_like(x, jnp.inf)
    return jnp.argmin(jnp.where(sel, x, big), axis=-1).astype(jnp.int32)


class SegmentResult(NamedTuple):
    bounds: jax.Array   # (..., n_bands + 3) int32; slots beyond count+3 repeat n
    cerf: jax.Array     # (..., n_bands) center frequencies; zero-padded
    count: jax.Array    # actual number of kept maxima (int32)
    raw_peaks: jax.Array  # maxima count BEFORE dedup (EFD.py:29's guard input)


def spectral_segments(f: jax.Array, n_bands: int) -> SegmentResult:
    """EFD.py:5-69 ``segm_tec`` semantics on the half-spectrum ``f``."""
    n = f.shape[-1]
    dtype = f.dtype
    dx = f[..., 1:] - f[..., :-1]
    zero = jnp.zeros_like(f[..., :1])
    dxf = jnp.concatenate([dx, zero], axis=-1)   # hstack((dx, 0))
    dxb = jnp.concatenate([zero, dx], axis=-1)   # hstack((0, dx))
    peak = (dxf <= 0) & (dxb > 0)

    locmax = jnp.where(peak, f, jnp.zeros_like(f))
    it = lax.broadcasted_iota(jnp.int32, f.shape, f.ndim - 1)
    locmax = jnp.where((it == 0) | (it == n - 1), jnp.zeros_like(locmax), locmax)

    # descending order with reversed-stable ties (numpy argsort()[::-1])
    order = jnp.flip(jnp.argsort(locmax, axis=-1, stable=True), axis=-1).astype(jnp.int32)

    # plateau-rightmost dedup (EFD.py:37-41): zero rank r when the next rank
    # holds the immediate left or right neighbor index, ranks 1..n-2
    nxt = jnp.concatenate([order[..., 1:], order[..., -1:]], axis=-1)
    r = lax.broadcasted_iota(jnp.int32, order.shape, order.ndim - 1)
    kill = ((order - 1 == nxt) | (order + 1 == nxt)) & (r >= 1) & (r <= n - 2)
    val_at_rank = jnp.take_along_axis(locmax, order, axis=-1)
    val_at_rank = jnp.where(kill, jnp.zeros_like(val_at_rank), val_at_rank)

    # keep the top n_bands surviving maxima, then re-sort by bin index
    pos_rank = jnp.where(val_at_rank > 0, order, jnp.full_like(order, n))
    alive_rank = jnp.cumsum((val_at_rank > 0).astype(jnp.int32), axis=-1) - 1
    keep = (val_at_rank > 0) & (alive_rank < n_bands)
    cand = jnp.where(keep, pos_rank, jnp.full_like(pos_rank, n))
    kept_sorted = jnp.sort(cand, axis=-1)[..., :n_bands]  # ascending bins, n pads last
    count = jnp.minimum(
        jnp.sum(val_at_rank > 0, axis=-1).astype(jnp.int32), n_bands
    )

    # bounds (EFD.py:56-66): 0, argmin before first max, argmins between
    # consecutive maxima (-1 offset), argmin after last (-1), n
    d = kept_sorted
    cnt = count[..., None]
    k = lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    d_next = jnp.concatenate([d[..., 1:], jnp.full_like(d[..., :1], n)], axis=-1)

    first = d[..., 0]
    b1 = _masked_argmin(f, jnp.zeros_like(first), first)

    # vectorized per-pair argmin: (..., n_bands) of argmin(f[d_k:d_{k+1}])
    it2 = lax.broadcasted_iota(jnp.int32, d.shape + (n,), d.ndim)
    lo = d[..., :, None]
    hi = jnp.where(k == cnt - 1, jnp.full_like(d, n), d_next)[..., :, None]
    sel = (it2 >= lo) & (it2 < hi)
    fb = jnp.broadcast_to(f[..., None, :], d.shape + (n,))
    am = jnp.argmin(jnp.where(sel, fb, jnp.full_like(fb, jnp.inf)), axis=-1).astype(jnp.int32)
    rel = am - lo[..., 0]  # argmin relative to d_k
    mids = d + rel - 1     # EFD.py's -1 offset

    bounds = jnp.zeros(f.shape[:-1] + (n_bands + 3,), jnp.int32)
    bounds = bounds.at[..., 1].set(b1)
    # slots 2..count+1 hold the mids for k=0..count-1 (last one is the
    # after-last-max bound); slot count+2 is n; beyond: n as inert pad
    slot = k + 2
    write = k < cnt
    bounds_mid = jnp.full(f.shape[:-1] + (n_bands + 3,), n, jnp.int32)

    def scat(buf, sl, vals, msk):
        return buf.at[jnp.where(msk, sl, buf.shape[-1] + 1)].set(vals, mode="drop")

    f_sc = scat
    for _ in range(bounds.ndim - 1):
        f_sc = jax.vmap(f_sc)
    bounds_mid = f_sc(bounds_mid, slot, mids, write)
    keepmask = lax.broadcasted_iota(jnp.int32, bounds.shape, bounds.ndim - 1)
    bounds = jnp.where((keepmask >= 2), bounds_mid, bounds)
    bounds = jnp.where(keepmask == cnt + 2, jnp.full_like(bounds, n), bounds)

    half = round(n) if isinstance(n, int) else n
    cerf = jnp.where(k < cnt, d, jnp.zeros_like(d)).astype(dtype) * jnp.pi / half
    return SegmentResult(bounds=bounds, cerf=cerf, count=count,
                         raw_peaks=jnp.sum(peak, axis=-1).astype(jnp.int32))


class EFDResult(NamedTuple):
    bands: jax.Array    # (..., n_bands + 2, n) float; rows beyond count+2 are 0
    cerf: jax.Array
    bounds: jax.Array   # normalized bounds in [0, pi] (float), as the ref returns
    count: jax.Array    # valid band rows = count_peaks + 2


@partial(jax.jit, static_argnames=("n_bands",))
def efd(x: jax.Array, n_bands: int) -> EFDResult:
    """Empirical Fourier Decomposition (EFD.py:72-110)."""
    n = x.shape[-1]
    dtype = x.dtype
    ff = rfft_best(x)
    half = round(ff.shape[-1] / 2)
    seg = spectral_segments(jnp.abs(ff[..., :half]), n_bands)

    half1 = round(ff.shape[-1] / 2)
    bounds_norm = seg.bounds.astype(dtype) * jnp.pi / half1

    l = round(n / 2)
    z = jnp.concatenate([jnp.flip(x[..., :l], axis=-1), x, jnp.flip(x[..., -l:], axis=-1)], axis=-1)
    ffz = rfft_best(z)
    m = ffz.shape[-1]
    # exact integer ceil of bounds*half2/half1.  The reference round-trips
    # through pi in float64 (EFD.py:84,93), where roundoff can push a bound
    # that lands exactly on an integer up by one bin; exact arithmetic is
    # deterministic under XLA's algebraic simplifications.
    half2 = round(m / 2)
    bound2 = (seg.bounds * half2 + (half1 - 1)) // half1

    nb = n_bands + 2
    bins = lax.broadcasted_iota(jnp.int32, x.shape[:-1] + (nb, m), x.ndim)
    lo = bound2[..., :nb, None]
    hi = bound2[..., 1 : nb + 1, None]
    main = (bins >= lo) & (bins < hi)
    # "negative frequency" mirror on the rfft tail: bins in [m-hi, m-lo) when
    # lo>0, else [m-hi, m)
    mlo = m - hi
    mhi = jnp.where(lo == 0, jnp.full_like(lo, m), m - lo)
    mirror = (bins >= mlo) & (bins < mhi)
    kidx = lax.broadcasted_iota(jnp.int32, x.shape[:-1] + (nb,), x.ndim - 1)
    valid = (kidx < (seg.count[..., None] + 2))[..., None] & (lo < hi)
    mask = (main | mirror) & valid

    ft = jnp.where(mask, ffz[..., None, :], jnp.zeros_like(ffz[..., None, :]))
    rx = irfft_best(ft, z.shape[-1])
    bands = rx[..., l:-l].astype(dtype)
    # EFD.py:29+81: fewer than 2 raw spectral maxima -> segm_tec returns a
    # 2-element bounds stub and EFD returns the INPUT unchanged.  Fixed
    # shape here: band row 0 carries x, everything else zero, count = 1.
    passthrough = seg.raw_peaks < 2
    row0 = lax.broadcasted_iota(jnp.int32, bands.shape[:-1], bands.ndim - 2)
    bands = jnp.where(
        passthrough[..., None, None],
        jnp.where((row0 == 0)[..., None], x[..., None, :],
                  jnp.zeros_like(bands)),
        bands,
    )
    count = jnp.where(passthrough, 1, seg.count + 2)
    return EFDResult(bands=bands, cerf=seg.cerf, bounds=bounds_norm, count=count)


# ---------------------------------------------------------------------------
# modified EFD: flipped-domain greedy band extraction (modified_efd.py)
# ---------------------------------------------------------------------------


def _flipped_segments(robust: jax.Array, n_req: int):
    """modified_efd.py:59-105 ``segm_tec``: maxima via the rising-edge
    detector on the half 'signal', bounds WITHOUT the -1 offset; also
    returns the strength ordering of the kept maxima."""
    from ..ops.extrema import extrema_masks

    half = robust[..., : robust.shape[-1] // 2]
    n = half.shape[-1]
    m = extrema_masks(half)
    peak = m.maxima  # detect_peaks(-x) in the reference == maxima of x
    vals = jnp.where(peak, half, jnp.zeros_like(half))
    order = jnp.flip(jnp.argsort(jnp.where(peak, half, -jnp.inf), axis=-1, stable=True), axis=-1).astype(jnp.int32)
    npeaks = jnp.sum(peak, axis=-1).astype(jnp.int32)
    # modified_efd.py:65: fewer than 4 maxima -> no bands at all (the
    # reference returns its zero-filled bounds and count 0)
    count = jnp.where(npeaks < 4, 0, jnp.minimum(npeaks, n_req))

    kept = jnp.where(
        lax.broadcasted_iota(jnp.int32, order[..., :n_req].shape, order.ndim - 1) < count[..., None],
        order[..., :n_req],
        jnp.full_like(order[..., :n_req], n),
    )
    d = jnp.sort(kept, axis=-1)

    k = lax.broadcasted_iota(jnp.int32, d.shape, d.ndim - 1)
    cnt = count[..., None]
    d_next = jnp.concatenate([d[..., 1:], jnp.full_like(d[..., :1], n)], axis=-1)
    it2 = lax.broadcasted_iota(jnp.int32, d.shape + (n,), d.ndim)
    lo = d[..., :, None]
    hi = jnp.where(k == cnt - 1, jnp.full_like(d, n), d_next)[..., :, None]
    sel = (it2 >= lo) & (it2 < hi)
    fb = jnp.broadcast_to(half[..., None, :], d.shape + (n,))
    am = jnp.argmin(jnp.where(sel, fb, jnp.full_like(fb, jnp.inf)), axis=-1).astype(jnp.int32)
    mids = am  # absolute argmin position == d + relative, no -1 here

    bounds = jnp.zeros(half.shape[:-1] + (n_req + 3,), jnp.int32)
    b1 = _masked_argmin(half, jnp.zeros_like(d[..., 0]), d[..., 0])
    bounds = bounds.at[..., 1].set(b1)
    slot = k + 2
    write = k < cnt

    def scat(buf, sl, vals, msk):
        return buf.at[jnp.where(msk, sl, buf.shape[-1] + 1)].set(vals, mode="drop")

    f_sc = scat
    for _ in range(bounds.ndim - 1):
        f_sc = jax.vmap(f_sc)
    filled = f_sc(jnp.full_like(bounds, n), slot, mids, write)
    pos = lax.broadcasted_iota(jnp.int32, bounds.shape, bounds.ndim - 1)
    bounds = jnp.where(pos >= 2, filled, bounds)
    bounds = jnp.where(pos == cnt + 2, jnp.full_like(bounds, n), bounds)
    # count == 0 (incl. the < 4-maxima guard): the reference's zbounds —
    # all-zero bounds make every band slice empty, so bands come out zero
    bounds = jnp.where(cnt == 0, jnp.zeros_like(bounds), bounds)

    # strength order of kept maxima: argsort(half[d])[::-1]
    strength = jnp.where(k < cnt, jnp.take_along_axis(half, jnp.clip(d, 0, n - 1), axis=-1), -jnp.inf)
    sort = jnp.flip(jnp.argsort(strength, axis=-1, stable=True), axis=-1).astype(jnp.int32)
    return bounds, count, sort


def _band_slice(robust: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """z[lo:hi] = robust[lo:hi]; z[-hi:-lo] = robust[-hi:-lo]; rfft(z).real
    (modified_efd.py:119-124).  Unlike EFD.py, modified_efd has NO
    ``lo == 0`` special case: ``z[-hi:-0]`` is an empty numpy slice, so a
    band starting at bound 0 gets no mirror tail."""
    n = robust.shape[-1]
    bins = lax.broadcasted_iota(jnp.int32, robust.shape, robust.ndim - 1)
    main = (bins >= lo[..., None]) & (bins < hi[..., None])
    mirror = (bins >= n - hi[..., None]) & (bins < n - lo[..., None]) & (hi[..., None] > lo[..., None]) & (lo[..., None] > 0)
    z = jnp.where(main | mirror, robust, jnp.zeros_like(robust))
    return rfft_best(z).real


@partial(jax.jit, static_argnames=("n_req",))
def efd_real(row: jax.Array, n_req: int):
    """modified_efd.py:111-128: treat a spectrum row as a signal, return all
    ``n_req + 2`` band spectra (rows beyond count+2 zero) + strength order."""
    robust = irfft_best(row, 2 * (row.shape[-1] - 1))
    bounds, count, sort = _flipped_segments(robust, n_req)
    nb = n_req + 2
    lo = bounds[..., :nb]
    hi = bounds[..., 1 : nb + 1]
    bands = jax.vmap(lambda l, h: _band_slice(robust, l, h), in_axes=(-1, -1), out_axes=0)(lo, hi)
    return bands, count, sort


def iterative_efd(row: jax.Array, elem: int, comb_size: int):
    """modified_efd.py:130-138: repeatedly extract the strongest band."""
    working = jnp.asarray(row)
    out = []
    for _ in range(elem):
        bands, count, sort = efd_real(working, comb_size)
        topband = bands[sort[0] + 1]
        out.append(topband)
        working = working - topband
    out.append(working)
    return jnp.stack(out)


@partial(jax.jit, static_argnames=("n_req",))
def efd_slice_max(row: jax.Array, n_req: int):
    """modified_efd.py:144-160: extract only the strongest band."""
    robust = irfft_best(row, 2 * (row.shape[-1] - 1))
    bounds, count, sort = _flipped_segments(robust, n_req)
    top = sort[..., 0]
    lo = jnp.take_along_axis(bounds, top[..., None] + 1, axis=-1)[..., 0]
    hi = jnp.take_along_axis(bounds, top[..., None] + 2, axis=-1)[..., 0]
    out = _band_slice(robust, lo, hi)
    return jnp.where(count[..., None] == 0, row, out)


def iterative_max(row: jax.Array, elem: int, comb_size: int):
    """modified_efd.py:162-170."""
    working = jnp.asarray(row)
    out = []
    for _ in range(elem):
        first = efd_slice_max(working, comb_size)
        out.append(first)
        working = working - first
    out.append(working)
    return jnp.stack(out)
