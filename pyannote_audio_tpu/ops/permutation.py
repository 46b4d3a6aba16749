"""Optimal speaker-permutation alignment (PIT), on-device.

Parity: /root/reference/src/pyannote/audio/utils/permutation.py
(``permutate`` :37-196, ``build_permutation_graph`` :199-275).

TPU-native design: the reference runs scipy's Hungarian solver per batch
item on host (permutation.py:161). With K <= 4 speakers (powerset
diarization caps K at 3-4), enumerating all K! permutations is cheaper and
branch-free: one (batch, K, K) cost einsum, a (K!, K) static permutation
table, a gather and an argmin — fully jittable and shardable. Exact
Hungarian (scipy) remains available host-side for large K.
"""

from __future__ import annotations

import itertools
from functools import lru_cache, partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def permutation_table(k: int) -> np.ndarray:
    """(k!, k) array of all permutations of range(k)."""
    return np.asarray(list(itertools.permutations(range(k))), dtype=np.int32)


@partial(jax.jit, static_argnames=("cost",))
def pairwise_cost(y1: jnp.ndarray, y2: jnp.ndarray, cost: str = "mse"
                  ) -> jnp.ndarray:
    """(B, F, K1) x (B, F, K2) -> (B, K1, K2) mean frame-wise cost."""
    if cost == "mse":
        d = jnp.mean(
            jnp.square(y1[:, :, :, None] - y2[:, :, None, :]), axis=1)
    elif cost == "mae":
        d = jnp.mean(
            jnp.abs(y1[:, :, :, None] - y2[:, :, None, :]), axis=1)
    else:
        raise ValueError(f"unknown cost {cost!r}")
    return d


def permutate_jax(
    y1: jnp.ndarray,            # (batch, frames, K) target
    y2: jnp.ndarray,            # (batch, frames, K) to be permuted
    cost: str = "mse",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Align y2's speakers to y1 per batch item (brute-force over K!).

    Returns (permutated_y2, perm_indices (batch, K)) with
    permutated[b, :, k] = y2[b, :, perm[b, k]].
    """
    K = y2.shape[-1]
    C = pairwise_cost(y1, y2, cost=cost)              # (B, K, K)
    perms = jnp.asarray(permutation_table(K))          # (K!, K)
    # total cost of each permutation: sum_k C[b, k, perm[p, k]]
    # advanced indices (1, K) and (P, K) broadcast to (P, K) -> (B, P, K)
    costs = jnp.sum(C[:, jnp.arange(K)[None, :], perms], axis=-1)
    best = jnp.argmin(costs, axis=-1)                  # (B,)
    perm = perms[best]                                 # (B, K)
    permutated = jnp.take_along_axis(y2, perm[:, None, :], axis=-1)
    return permutated, perm


def mse_cost_func(Y, y, **kwargs) -> np.ndarray:
    """Class-wise mean-squared error, (frames, classes) -> (classes,).

    Parity: mse_cost_func (reference utils/permutation.py:69-81)."""
    return np.mean(np.square(np.asarray(Y) - np.asarray(y)), axis=0)


def mae_cost_func(Y, y, **kwargs) -> np.ndarray:
    """Class-wise mean absolute error, (frames, classes) -> (classes,).

    Parity: mae_cost_func (reference utils/permutation.py:84-96)."""
    return np.mean(np.abs(np.asarray(Y) - np.asarray(y)), axis=0)


def _resolve_cost(cost_func) -> Tuple[Optional[str], Optional[object]]:
    """Map a reference-style cost_func to a builtin name or a callable."""
    if cost_func is None or cost_func == "mse" or cost_func is mse_cost_func:
        return "mse", None
    if cost_func == "mae" or cost_func is mae_cost_func:
        return "mae", None
    if callable(cost_func):
        return None, cost_func
    raise ValueError(f"unknown cost_func {cost_func!r}")


def _callable_cost_matrix(y1: np.ndarray, y2: np.ndarray,
                          cost_func) -> np.ndarray:
    """(B, K, K) cost via a user callable with (frames, classes) -> (classes,)
    semantics (reference utils/permutation.py:126-140)."""
    B, _, K = y1.shape
    C = np.zeros((B, K, K), dtype=np.float32)
    for b in range(B):
        for i in range(K):
            column = np.repeat(y1[b, :, i:i + 1], K, axis=1)
            C[b, i] = np.asarray(cost_func(column, y2[b]))
    return C


def permutate(
    y1: np.ndarray,
    y2: np.ndarray,
    cost_func=None,
    return_cost: bool = False,
):
    """Host API mirroring the reference's ``permutate`` (numpy in/out).

    ``cost_func`` accepts "mse" (default) / "mae", the module's
    mse_cost_func/mae_cost_func, or any callable with their
    (frames, classes) -> (classes,) contract. Falls back to scipy's
    Hungarian for K > 6 where K! blows up.
    """
    y1 = np.asarray(y1, dtype=np.float32)
    y2 = np.asarray(y2, dtype=np.float32)
    squeeze = y1.ndim == 2
    if squeeze:
        y1 = y1[None]
    if y2.ndim == 2:
        y2 = np.broadcast_to(y2[None], (y1.shape[0],) + y2.shape)

    K1, K2 = y1.shape[-1], y2.shape[-1]
    # pad the smaller side so speakers map one-to-one (reference pads with
    # zeros, permutation.py:120-130)
    K = max(K1, K2)
    if K1 < K:
        y1 = np.pad(y1, ((0, 0), (0, 0), (0, K - K1)))
    if K2 < K:
        y2 = np.pad(y2, ((0, 0), (0, 0), (0, K - K2)))

    cost_name, cost_callable = _resolve_cost(cost_func)

    def cost_matrix() -> np.ndarray:
        if cost_callable is not None:
            return _callable_cost_matrix(y1, y2, cost_callable)
        return np.asarray(pairwise_cost(jnp.asarray(y1), jnp.asarray(y2),
                                        cost=cost_name))

    if K <= 6 and cost_callable is None:
        permutated, perm = permutate_jax(jnp.asarray(y1), jnp.asarray(y2),
                                         cost=cost_name)
        permutated = np.asarray(permutated)
        perm = np.asarray(perm)
    else:
        from scipy.optimize import linear_sum_assignment
        B = y1.shape[0]
        perm = np.zeros((B, K), dtype=np.int32)
        permutated = np.zeros_like(y2)
        C = cost_matrix()
        for b in range(B):
            _, cols = linear_sum_assignment(C[b])
            perm[b] = cols
            permutated[b] = y2[b][:, cols]

    permutated = permutated[..., :K1]
    perms: List[Tuple[Optional[int], ...]] = [
        tuple(int(p) if p < K2 else None for p in row[:K1]) for row in perm]
    if squeeze:
        permutated = permutated[0]
    if return_cost:
        return permutated, perms, cost_matrix()
    return permutated, perms


def permutate_numpy(y1, y2, cost_func="mse", return_cost: bool = False):
    """Parity alias (reference utils/permutation.py:177-192)."""
    return permutate(y1, y2, cost_func=cost_func, return_cost=return_cost)


def permutate_torch(y1, y2, cost_func="mse", return_cost: bool = False):
    """torch-tensor adapter (reference utils/permutation.py:100-174):
    converts to numpy, permutates on host, returns torch tensors."""
    import torch
    out = permutate(y1.detach().cpu().numpy(),
                    y2.detach().cpu().numpy(),
                    cost_func=cost_func, return_cost=return_cost)
    if return_cost:
        permutated, perms, C = out
        return (torch.from_numpy(np.ascontiguousarray(permutated)), perms,
                torch.from_numpy(np.ascontiguousarray(C)))
    permutated, perms = out
    return torch.from_numpy(np.ascontiguousarray(permutated)), perms


def build_permutation_graph(
    segmentations,  # SlidingWindowFeature (chunks, frames, K)
    onset: float = 0.5,
    cost: str = "mae",
) -> List[Tuple[int, int, Tuple]]:
    """Chunk-stitching graph: permutation of each chunk vs its neighbors.

    Returns [(chunk_i, chunk_j, perm)] for overlapping chunk pairs, used by
    stitching-based pipelines (parity: permutation.py:199-275).
    """
    from ..core.segment import SlidingWindowFeature
    assert isinstance(segmentations, SlidingWindowFeature)
    data = segmentations.data
    window = segmentations.sliding_window
    num_chunks = len(data)
    overlap_chunks = int(np.floor(window.duration / window.step)) - 1
    frames_per_step = int(np.rint(
        data.shape[1] * window.step / window.duration))
    edges = []
    for i in range(num_chunks):
        for j in range(i + 1, min(i + 1 + overlap_chunks, num_chunks)):
            shift = (j - i) * frames_per_step
            a = data[i][shift:]
            b = data[j][:a.shape[0]]
            if a.shape[0] == 0:
                continue
            _, perms = permutate(a, b, cost_func=None)
            edges.append((i, j, perms[0]))
    return edges
