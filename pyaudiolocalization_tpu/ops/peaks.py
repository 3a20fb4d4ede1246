"""Vectorized peak detection (scipy.signal.find_peaks semantics).

The reference calls scipy's C find_peaks per mic pair (utils.py:151-152) with
a height threshold and a minimum peak distance.  Here detection is branchless
array math over a whole (scenes, pairs) batch:

  * local maxima: strict three-point comparison by default; with
    ``plateaus=True`` (used by the reference-parity lag mode) equal-valued
    plateaus resolve to scipy's plateau midpoint via two segmented scans —
    bit-exact find_peaks semantics.  Physical mode keeps the strict
    comparison: plateaus are a measure-zero event for whitened correlations
    and the segmented scans cost two O(n log n) passes on the hot path;
  * a static top-K candidate set per row (K >= any realistic surviving peak
    count; the tallest peak always survives pruning, so num_peaks=1 —
    the pipeline's setting, main.py:204 — is exact);
  * distance pruning by descending height priority, matching scipy's
    "smaller peaks are removed first" rule with strict < distance removal.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf

# These entry points are jitted at definition: the plateau path lowers to two
# associative scans whose EAGER execution costs hundreds of per-op XLA
# compiles (~25 ms each on a 1-core host) on every new shape, vs one
# persistent-cacheable compile under jit.  All callers inside outer jits just
# inline (nested jit is free at trace time).


@functools.partial(jax.jit, static_argnames=("plateaus",))
def local_maxima(x: jnp.ndarray, plateaus: bool = False) -> jnp.ndarray:
    """Local maxima along the last axis.

    ``plateaus=False``: strict interior three-point maxima (fast path).
    ``plateaus=True``: scipy.signal.find_peaks semantics — an equal-valued
    plateau whose left edge rises and right edge falls marks ONE peak at the
    plateau midpoint (scipy's ``(left_edge + right_edge) // 2``, reference:
    utils.py:152).  Implemented with two segmented copy-scans (forward run
    starts, backward run ends), no data-dependent gathers."""
    if not plateaus:
        left = x[..., 1:-1] > x[..., :-2]
        right = x[..., 1:-1] > x[..., 2:]
        core = left & right
        pad = [(0, 0)] * (x.ndim - 1) + [(1, 1)]
        return jnp.pad(core, pad, constant_values=False)

    n = x.shape[-1]
    if n < 3:
        return jnp.zeros_like(x, bool)
    t = jnp.arange(n)
    pad1 = [(0, 0)] * (x.ndim - 1)
    # Run boundaries: start[t] = first sample of t's equal-value run.
    change = jnp.pad(x[..., 1:] != x[..., :-1], pad1 + [(1, 0)],
                     constant_values=True)
    rising = jnp.pad(x[..., 1:] > x[..., :-1], pad1 + [(1, 0)],
                     constant_values=False)
    endb = jnp.pad(x[..., :-1] != x[..., 1:], pad1 + [(0, 1)],
                   constant_values=True)
    falling = jnp.pad(x[..., :-1] > x[..., 1:], pad1 + [(0, 1)],
                      constant_values=False)

    def seg_op(a, b):
        # Segmented copy: a reset element overrides everything to its left.
        (av, ai, ab), (bv, bi, bb) = a, b
        return (jnp.where(bb, bv, av), jnp.where(bb, bi, ai), ab | bb)

    tb = jnp.broadcast_to(t, x.shape)
    ok_left, start, _ = jax.lax.associative_scan(
        seg_op, (rising, tb, change), axis=-1)
    okr_r, endr_r, _ = jax.lax.associative_scan(
        seg_op, (jnp.flip(falling, -1), jnp.flip(tb, -1), jnp.flip(endb, -1)),
        axis=-1)
    ok_right = jnp.flip(okr_r, -1)
    end = jnp.flip(endr_r, -1)
    return ok_left & ok_right & (tb == (start + end) // 2)


@functools.partial(jax.jit, static_argnames=("distance", "k", "plateaus"))
def select_peaks(x: jnp.ndarray,
                 threshold: jnp.ndarray,
                 distance: int,
                 k: int = 128,
                 window_mask: jnp.ndarray | None = None,
                 plateaus: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Top-K peaks with height >= threshold and min separation ``distance``.

    x: (..., n); threshold broadcastable to x (per-row scalar).
    Returns (positions, heights, keep), ordered by descending height
    (stable).  ``keep`` marks candidates that exist and survived distance
    pruning.

    Exactness: pruning restricted to the K tallest candidates is exact *for
    those candidates* — any suppressor of a top-K peak is taller and hence
    also in top-K, and so is its own suppressor chain.  When a lag window
    will be applied afterwards (``window_mask``, pre-dilated by the caller),
    the top-K *within the window* are merged in so the tallest surviving
    in-window peak is present even when globally short.
    """
    mask = local_maxima(x, plateaus=plateaus) & (x >= threshold)
    vals = jnp.where(mask, x, NEG_INF)
    heights, pos = jax.lax.top_k(vals, k)          # sorted desc
    if window_mask is not None:
        vals_w = jnp.where(window_mask, vals, NEG_INF)
        h2, p2 = jax.lax.top_k(vals_w, k)
        heights = jnp.concatenate([heights, h2], -1)
        pos = jnp.concatenate([pos, p2], -1)
        order = jnp.argsort(-heights, axis=-1, stable=True)
        heights = jnp.take_along_axis(heights, order, -1)
        pos = jnp.take_along_axis(pos, order, -1)
    total = heights.shape[-1]
    exists = jnp.isfinite(heights)

    def body(r, keep):
        pr = jnp.take_along_axis(pos, jnp.full(pos.shape[:-1] + (1,), r), -1)
        kr = jnp.take_along_axis(keep, jnp.full(pos.shape[:-1] + (1,), r), -1)
        # |pos - pr| < distance also catches duplicate positions from the
        # merged window set (0 < distance): the later copy is suppressed.
        close = jnp.abs(pos - pr) < distance
        later = jnp.arange(total) > r
        suppressed = close & later & kr
        return keep & ~suppressed

    keep = jax.lax.fori_loop(0, total, body, exists)
    return pos, heights, keep


def compact_valid(pos: jnp.ndarray, heights: jnp.ndarray, keep: jnp.ndarray):
    """Stable-compact valid candidates to the front (height order kept)."""
    order = jnp.argsort(~keep, axis=-1, stable=True)
    return (jnp.take_along_axis(pos, order, -1),
            jnp.take_along_axis(heights, order, -1),
            jnp.take_along_axis(keep, order, -1))


@functools.partial(jax.jit, static_argnames=("distance", "k"))
def select_peaks_two(x: jnp.ndarray, thr_a: jnp.ndarray, thr_b: jnp.ndarray,
                     distance: int, k: int = 128):
    """Two-threshold variant of ``select_peaks`` sharing one candidate set.

    Exactness: thresholds are pure height cuts and candidates are ordered by
    height, so the k tallest unthresholded local maxima restricted to
    height >= thr equal the thresholded top-k; each threshold's suppression
    runs on its own keep mask inside ONE pruning loop.  Returns
    (pos, heights, keep_a, keep_b) — equivalent to two select_peaks calls
    (without window merging) at roughly half the cost.
    """
    mask = local_maxima(x)
    vals = jnp.where(mask, x, NEG_INF)
    heights, pos = jax.lax.top_k(vals, k)          # sorted desc
    exists = jnp.isfinite(heights)
    keep_a0 = exists & (heights >= thr_a)
    keep_b0 = exists & (heights >= thr_b)

    def body(r, carry):
        keep_a, keep_b = carry
        pr = jnp.take_along_axis(pos, jnp.full(pos.shape[:-1] + (1,), r), -1)
        close = (jnp.abs(pos - pr) < distance) & (jnp.arange(k) > r)
        ka_r = jnp.take_along_axis(keep_a, jnp.full(pos.shape[:-1] + (1,), r), -1)
        kb_r = jnp.take_along_axis(keep_b, jnp.full(pos.shape[:-1] + (1,), r), -1)
        return (keep_a & ~(close & ka_r), keep_b & ~(close & kb_r))

    keep_a, keep_b = jax.lax.fori_loop(0, k, body, (keep_a0, keep_b0))
    return pos, heights, keep_a, keep_b
