"""Jittable Lloyd-iteration KMeans.

Completes the SURVEY.md §2.9 mapping for sklearn's KMeans (the forced-
cluster fallback of the clustering stage, reference pipelines/
clustering.py:545-547,635-637): deterministic kmeans++-style seeding from
a supplied key, fixed-iteration Lloyd updates under ``lax.scan`` (static
shapes; empty clusters keep their previous centroid), best-of-``n_init``
by inertia.

sklearn remains the default in pipelines/clustering.py (seeded parity);
opt in with PYANNOTE_TPU_DEVICE_KMEANS=1 for fully on-device deployments.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _plusplus_init(key, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """kmeans++ seeding: each next centroid drawn ∝ squared distance."""
    n = x.shape[0]
    first = jax.random.randint(key, (), 0, n)
    centroids0 = jnp.tile(x[first], (k, 1))

    def step(carry, key_t):
        centroids, t = carry
        d2 = jnp.sum((x[:, None] - centroids[None]) ** 2, axis=-1)
        # only the first t centroids are real; mask the rest
        valid = jnp.arange(k) < t
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        dmin = jnp.min(d2, axis=1)
        probs = dmin / (jnp.sum(dmin) + 1e-12)
        idx = jax.random.choice(key_t, n, p=probs)
        centroids = centroids.at[t].set(x[idx])
        return (centroids, t + 1), None

    keys = jax.random.split(key, k)
    (centroids, _), _ = jax.lax.scan(step, (centroids0, 1), keys[1:])
    return centroids


@partial(jax.jit, static_argnames=("k", "iters"))
def _lloyd(key, x: jnp.ndarray, k: int, iters: int = 25
           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    centroids = _plusplus_init(key, x, k)

    def step(centroids, _):
        d2 = jnp.sum((x[:, None] - centroids[None]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)                     # (n,)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)   # (n, k)
        counts = jnp.sum(onehot, axis=0)                    # (k,)
        sums = onehot.T @ x                                 # (k, d)
        new = jnp.where(counts[:, None] > 0,
                        sums / jnp.maximum(counts[:, None], 1.0),
                        centroids)                          # keep empty
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    d2 = jnp.sum((x[:, None] - centroids[None]) ** 2, axis=-1)
    assign = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return assign, inertia


def kmeans_jax(embeddings: np.ndarray, num_clusters: int,
               n_init: int = 3, iters: int = 25,
               seed: int = 42) -> np.ndarray:
    """Best-of-n_init Lloyd KMeans on device -> (n,) int cluster ids."""
    if not np.all(np.isfinite(embeddings)):
        # sklearn raises at the call site; a NaN inertia would otherwise
        # never beat np.inf and silently return None
        raise ValueError("kmeans_jax: input contains NaN or infinity")
    x = jnp.asarray(embeddings, jnp.float32)
    best = (None, np.inf)
    for i in range(n_init):
        key = jax.random.PRNGKey(seed + i)
        assign, inertia = _lloyd(key, x, int(num_clusters), iters)
        inertia = float(inertia)
        if inertia < best[1]:
            best = (np.asarray(assign), inertia)
    return best[0]
