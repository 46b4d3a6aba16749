"""Agglomerative (centroid-linkage) clustering on device.

Completes the SURVEY.md §2.9 mapping for scipy's ``linkage``/``fcluster``:
a jittable fixed-iteration merge loop over the (N, N) centroid-distance
matrix. Each of the N-1 iterations finds the global argmin pair and merges
it with the Lance-Williams centroid update — O(N^2) work per iteration,
all dense masked ops (compiler-friendly; no data-dependent shapes).

scipy remains the default in pipelines/clustering.py (bit-exact
tie-breaking parity); this op exists for fully on-device deployments and
is validated against scipy at the cluster-assignment level.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_INF = 1e30


@partial(jax.jit, static_argnames=())
def centroid_linkage(embeddings: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                       jnp.ndarray]:
    """Centroid-linkage merge sequence.

    Parameters
    ----------
    embeddings : (N, D) float32

    Returns
    -------
    merges : (N-1, 2) int32 — indices merged at each step (into slot
        ``merges[t, 0]``; slot ``merges[t, 1]`` is retired)
    heights : (N-1,) float32 — euclidean centroid distance of each merge
    """
    n, d = embeddings.shape
    centroids0 = jnp.asarray(embeddings, jnp.float32)
    sizes0 = jnp.ones((n,), jnp.float32)
    alive0 = jnp.ones((n,), bool)

    def pairwise(centroids, alive):
        sq = jnp.sum(centroids ** 2, axis=1)
        d2 = sq[:, None] + sq[None, :] - 2.0 * centroids @ centroids.T
        d2 = jnp.maximum(d2, 0.0)
        mask = alive[:, None] & alive[None, :]
        d2 = jnp.where(mask, d2, _INF)
        return d2 + jnp.eye(n) * _INF

    def step(carry, _):
        centroids, sizes, alive = carry
        d2 = pairwise(centroids, alive)
        flat = jnp.argmin(d2)
        i, j = flat // n, flat % n
        i, j = jnp.minimum(i, j), jnp.maximum(i, j)
        height = jnp.sqrt(d2[i, j])
        # merge j into i: centroid = size-weighted mean
        si, sj = sizes[i], sizes[j]
        merged = (centroids[i] * si + centroids[j] * sj) / (si + sj)
        centroids = centroids.at[i].set(merged)
        sizes = sizes.at[i].set(si + sj)
        alive = alive.at[j].set(False)
        return (centroids, sizes, alive), (jnp.stack([i, j]), height)

    (_, _, _), (merges, heights) = jax.lax.scan(
        step, (centroids0, sizes0, alive0), None, length=n - 1)
    return merges.astype(jnp.int32), heights


def fcluster_by_distance(merges: np.ndarray, heights: np.ndarray,
                         num_leaves: int, threshold: float) -> np.ndarray:
    """Cut the merge sequence at ``threshold`` -> 0-indexed cluster ids.

    Host union-find over the (tiny) merge list; equivalent of scipy's
    ``fcluster(criterion="distance")``: a merge only joins a flat cluster
    when the MAX merge height over its whole subtree is <= threshold
    (scipy's per-node monocrit). Centroid linkage can produce inversions
    (a later merge lower than an earlier one), so the per-slot running
    max matters — unioning on the raw height alone would reconnect
    through an already-rejected tall merge.
    """
    parent = np.arange(num_leaves)
    # running max merge height of the subtree each SLOT currently holds
    max_height = np.zeros(num_leaves, dtype=np.float64)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for (i, j), h in zip(np.asarray(merges), np.asarray(heights)):
        i, j = int(i), int(j)
        monocrit = max(float(h), max_height[i], max_height[j])
        if monocrit <= threshold:
            ri, rj = find(i), find(j)
            if ri != rj:
                parent[rj] = ri
        max_height[i] = monocrit      # slot i now holds the merged subtree
    roots = np.array([find(x) for x in range(num_leaves)])
    _, clusters = np.unique(roots, return_inverse=True)
    return clusters


def linkage_matrix_from_merges(merges: np.ndarray, heights: np.ndarray,
                               num_leaves: int) -> np.ndarray:
    """Convert the device merge sequence to scipy's (N-1, 4) linkage format.

    Columns: [node_a, node_b, height, size] with new internal nodes numbered
    ``num_leaves + t`` at step ``t`` — interchangeable with
    ``scipy.cluster.hierarchy.linkage`` output, so downstream consumers
    (``fcluster``, the iteration-based re-cut in pipelines/clustering.py)
    work unchanged.
    """
    merges = np.asarray(merges)
    heights = np.asarray(heights, np.float64)
    node_of_slot = np.arange(num_leaves)
    size_of_slot = np.ones(num_leaves, np.int64)
    out = np.zeros((num_leaves - 1, 4), np.float64)
    for t, ((i, j), h) in enumerate(zip(merges, heights)):
        i, j = int(i), int(j)
        a, b = node_of_slot[i], node_of_slot[j]
        size = size_of_slot[i] + size_of_slot[j]
        out[t] = [min(a, b), max(a, b), h, size]
        node_of_slot[i] = num_leaves + t
        size_of_slot[i] = size
    return out


def device_linkage(embeddings: np.ndarray,
                   unit_norm: bool = False) -> np.ndarray:
    """scipy-compatible centroid linkage computed on device."""
    x = np.asarray(embeddings, np.float32)
    if unit_norm:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norms > 0, norms, 1.0)
    merges, heights = centroid_linkage(jnp.asarray(x))
    return linkage_matrix_from_merges(np.asarray(merges),
                                      np.asarray(heights), len(x))


def ahc_on_device(embeddings: np.ndarray, threshold: float,
                  unit_norm: bool = True) -> np.ndarray:
    """Full on-device AHC: linkage on TPU, threshold cut on host."""
    x = np.asarray(embeddings, np.float32)
    if unit_norm:
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norms > 0, norms, 1.0)
    merges, heights = centroid_linkage(jnp.asarray(x))
    return fcluster_by_distance(np.asarray(merges), np.asarray(heights),
                                len(x), threshold)
