"""On-device clustering for solver initialization.

Counterpart of the sklearn KMeans/DBSCAN/silhouette usage in the reference
(utils.py:273-362).  The data here is tiny — one 3-D point per mic pair — so
these are not throughput kernels; they exist so the entire localization
pipeline stays inside one XLA graph (no host sklearn round-trip per scene)
and vmaps over scene batches.

Semantics notes:
  * silhouette matches sklearn's definition exactly (mean over samples of
    (b-a)/max(a,b), a = mean intra-cluster distance excluding self, b = min
    mean distance to another cluster; singleton clusters score 0);
  * KMeans uses k-means++ style seeding from an explicit PRNG key + Lloyd
    iterations; cluster *centers* are equivalent in quality to sklearn's but
    not bitwise identical (sklearn's RNG is not reproduced — the reference
    only feeds these to a least-squares solver as initial guesses);
  * DBSCAN matches sklearn's cluster structure (core = >= min_samples
    neighbors within eps incl. self; clusters = components of the core
    eps-graph; border joins an adjacent core's cluster; noise = -1), with
    labels renumbered by first occurrence.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def _pairwise_dist(x: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((x[:, None, :] - x[None, :, :]) ** 2, -1)
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def silhouette_score(x: jnp.ndarray, labels: jnp.ndarray, num_clusters: int,
                     valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean silhouette over valid samples; labels in [0, num_clusters)."""
    n = x.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    dist = _pairwise_dist(x)
    onehot = (labels[:, None] == jnp.arange(num_clusters)[None, :]) & valid[:, None]
    counts = jnp.sum(onehot, 0)                                   # (k,)
    # Sum of distances from each sample to each cluster: (n, k).
    sums = dist @ onehot.astype(dist.dtype)
    own_count = jnp.take(counts, labels)
    # a: mean distance to own cluster, excluding self (distance 0).
    a = jnp.take_along_axis(sums, labels[:, None], 1)[:, 0] / jnp.maximum(
        own_count - 1, 1)
    # b: min over other clusters of mean distance.
    mean_other = sums / jnp.maximum(counts, 1)[None, :]
    other_mask = (jnp.arange(num_clusters)[None, :] != labels[:, None]) & (
        counts[None, :] > 0)
    b = jnp.min(jnp.where(other_mask, mean_other, jnp.inf), 1)
    # Guard representable in float32 (1e-300 flushes to zero under XLA).
    denom_ab = jnp.maximum(jnp.maximum(a, b), 1e-30)
    s = jnp.where(own_count > 1, (b - a) / denom_ab, 0.0)
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, s, 0.0)) / denom


class KMeansResult(NamedTuple):
    centers: jnp.ndarray   # (k, d)
    labels: jnp.ndarray    # (n,)
    inertia: jnp.ndarray


def kmeans(x: jnp.ndarray, k: int, key: jax.Array, iters: int = 25,
           valid: jnp.ndarray | None = None) -> KMeansResult:
    """k-means++ seeding + Lloyd iterations over (n, d) points; ``valid``
    masks padding rows out of both seeding and updates."""
    n, d = x.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    w = valid.astype(x.dtype)

    # k-means++ seeding.
    keys = jax.random.split(key, k)
    first = jax.random.categorical(keys[0], jnp.where(valid, 0.0, -jnp.inf))
    centers0 = jnp.zeros((k, d), x.dtype).at[0].set(x[first])

    def seed_step(i, centers):
        d2 = jnp.min(jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
                     + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf), 1)
        d2 = jnp.where(valid, d2, 0.0)
        logits = jnp.where(valid & (d2 > 0), jnp.log(jnp.maximum(d2, 1e-30)),
                           -jnp.inf)
        # If every remaining point coincides with a center, fall back to
        # uniform choice over valid points.
        any_pos = jnp.any(jnp.isfinite(logits))
        logits = jnp.where(any_pos, logits, jnp.where(valid, 0.0, -jnp.inf))
        idx = jax.random.categorical(keys[i], logits)
        return centers.at[i].set(x[idx])

    centers = jax.lax.fori_loop(1, k, seed_step, centers0)

    def lloyd(_, centers):
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
        labels = jnp.argmin(d2, 1)
        onehot = ((labels[:, None] == jnp.arange(k)[None, :]) * w[:, None])
        counts = jnp.sum(onehot, 0)
        sums = onehot.T @ x
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1)[:, None],
                        centers)
        return new

    centers = jax.lax.fori_loop(0, iters, lloyd, centers)
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, -1)
    labels = jnp.argmin(d2, 1)
    inertia = jnp.sum(jnp.where(valid, jnp.min(d2, 1), 0.0))
    return KMeansResult(centers, labels, inertia)


class DbscanResult(NamedTuple):
    labels: jnp.ndarray        # (n,) cluster id or -1 for noise
    num_clusters: jnp.ndarray  # scalar int


def dbscan(x: jnp.ndarray, eps: float, min_samples: int,
           valid: jnp.ndarray | None = None) -> DbscanResult:
    n = x.shape[0]
    if valid is None:
        valid = jnp.ones(n, bool)
    dist = _pairwise_dist(x)
    adj = (dist <= eps) & valid[None, :] & valid[:, None]
    neighbor_count = jnp.sum(adj, 1)           # includes self
    core = (neighbor_count >= min_samples) & valid

    # Connected components over core points: iterate min-label propagation.
    init = jnp.where(core, jnp.arange(n), n)   # n == +inf sentinel

    def propagate(_, lab):
        # For each core point, min label among adjacent core points.
        cand = jnp.where(adj & core[None, :], lab[None, :], n)
        new = jnp.min(cand, 1)
        return jnp.where(core, jnp.minimum(lab, new), lab)

    labels = jax.lax.fori_loop(0, n, propagate, init)
    # Border points: adjacent to some core -> that core's cluster.
    border_cand = jnp.where(adj & core[None, :], labels[None, :], n)
    border_label = jnp.min(border_cand, 1)
    labels = jnp.where(core, labels,
                       jnp.where(valid & (border_label < n), border_label, n))
    # Renumber by first occurrence; sentinel n -> -1 (noise).
    is_root = (labels == jnp.arange(n)) & (labels < n)
    new_id = jnp.cumsum(is_root) - 1
    renum = jnp.where(labels < n, jnp.take(new_id, jnp.minimum(labels, n - 1)), -1)
    num = jnp.sum(is_root)
    return DbscanResult(renum, num)


class KMeansMultiResult(NamedTuple):
    centers: jnp.ndarray   # (K, max_k, d); variant j uses rows 0..j
    labels: jnp.ndarray    # (K, n)
    inertia: jnp.ndarray   # (K,)


def kmeans_multi(x: jnp.ndarray, max_k: int, key: jax.Array,
                 iters: int = 10,
                 valid: jnp.ndarray | None = None) -> KMeansMultiResult:
    """All of k = 1..max_k in ONE batched run.

    One k-means++ sequence of max_k centers seeds every variant (variant j
    initializes from its first j+1 entries — a shared-prefix seeding, an
    implementation detail the reference leaves to sklearn's RNG anyway);
    Lloyd iterations then vmap across the max_k variants with per-variant
    center masks.  Replaces max_k sequential ``kmeans`` calls in the hot
    per-scene solver graph.
    """
    n, d = x.shape
    if valid is None:
        valid = jnp.ones(n, bool)
    w = valid.astype(x.dtype)

    seed_run = kmeans(x, max_k, key, iters=0, valid=valid)
    seeds = seed_run.centers                                   # (max_k, d)
    k_idx = jnp.arange(max_k)
    cmask = k_idx[None, :] <= k_idx[:, None]                   # (K, max_k)
    # Variant j: rows 0..j from the shared seeding, rest parked on seed 0
    # (masked out of assignment by +inf distance below).
    centers0 = jnp.where(cmask[:, :, None], seeds[None, :, :], seeds[0])

    def lloyd(_, centers):
        d2 = jnp.sum((x[None, :, None, :] - centers[:, None, :, :]) ** 2, -1)
        d2 = jnp.where(cmask[:, None, :], d2, jnp.inf)         # (K, n, max_k)
        labels = jnp.argmin(d2, -1)
        onehot = ((labels[..., None] == k_idx[None, None, :])
                  * w[None, :, None])                          # (K, n, max_k)
        counts = jnp.sum(onehot, 1)                            # (K, max_k)
        sums = jnp.einsum("knm,nd->kmd", onehot, x)
        new = jnp.where(counts[..., None] > 0,
                        sums / jnp.maximum(counts, 1)[..., None], centers)
        return jnp.where(cmask[:, :, None], new, centers)

    centers = jax.lax.fori_loop(0, iters, lloyd, centers0)
    d2 = jnp.sum((x[None, :, None, :] - centers[:, None, :, :]) ** 2, -1)
    d2 = jnp.where(cmask[:, None, :], d2, jnp.inf)
    labels = jnp.argmin(d2, -1)
    inertia = jnp.sum(jnp.where(valid[None, :], jnp.min(d2, -1), 0.0), -1)
    return KMeansMultiResult(centers, labels, inertia)
