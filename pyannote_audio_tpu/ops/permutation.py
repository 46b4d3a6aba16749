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
    C = pairwise_cost(y1, y2, cost=cost)              # (B, K, K)
    return _permutate_from_cost(y2, C)


def _permutate_from_cost(y2: jnp.ndarray, C: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Select the best of the K! permutations given the (B, K, K) cost."""
    K = y2.shape[-1]
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
    """(B, K1, K2) cost via a user callable with (frames, classes) ->
    (classes,) semantics. Argument order matches the reference:
    ``cost_func(y2, y1_column_expanded)`` (utils/permutation.py:143-148)."""
    B, _, K1 = y1.shape
    K2 = y2.shape[-1]
    C = np.zeros((B, K1, K2), dtype=np.float32)
    for b in range(B):
        for i in range(K1):
            column = np.repeat(y1[b, :, i:i + 1], K2, axis=1)
            C[b, i] = np.asarray(cost_func(y2[b], column))
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

    Unequal speaker counts follow the reference exactly
    (utils/permutation.py:150-165): when K2 > K1 the COST matrix is
    padded to square with ``max(cost) + 1`` rows (a constant, so the real
    rows get the optimal rectangular assignment); when K1 > K2 the
    rectangular assignment is solved directly and unmatched y1 speakers
    map to None / zero columns. Signals are never zero-padded — that
    would bias the assignment toward matching quiet speakers.
    """
    y1 = np.asarray(y1, dtype=np.float32)
    y2 = np.asarray(y2, dtype=np.float32)
    squeeze = y1.ndim == 2
    if squeeze:
        y1 = y1[None]
    if y2.ndim == 2:
        y2 = np.broadcast_to(y2[None], (y1.shape[0],) + y2.shape)

    B, _, K1 = y1.shape
    K2 = y2.shape[-1]
    cost_name, cost_callable = _resolve_cost(cost_func)

    def cost_matrix() -> np.ndarray:      # true-shape (B, K1, K2)
        if cost_callable is not None:
            return _callable_cost_matrix(y1, y2, cost_callable)
        return np.asarray(pairwise_cost(jnp.asarray(y1), jnp.asarray(y2),
                                        cost=cost_name))

    C: Optional[np.ndarray] = None
    if K1 == K2 and K1 <= 6 and cost_callable is None:
        # compute the (B, K, K) cost once and reuse it for return_cost
        Cj = pairwise_cost(jnp.asarray(y1), jnp.asarray(y2), cost=cost_name)
        permutated_jx, perm = _permutate_from_cost(jnp.asarray(y2), Cj)
        if return_cost:
            C = np.asarray(Cj)
        permutated = np.asarray(permutated_jx)
        perms: List[Tuple[Optional[int], ...]] = [
            tuple(int(p) for p in row) for row in np.asarray(perm)]
    else:
        from scipy.optimize import linear_sum_assignment
        C = cost_matrix()
        permutated = np.zeros((B, y1.shape[1], K1), dtype=y2.dtype)
        perms = []
        for b in range(B):
            cost = C[b]
            if K2 > K1:
                pad = np.full((K2 - K1, K2), cost.max() + 1.0,
                              dtype=cost.dtype)
                cost = np.concatenate([cost, pad], axis=0)
            rows, cols = linear_sum_assignment(cost)
            permutation: List[Optional[int]] = [None] * K1
            for r, c in zip(rows, cols):
                if r < K1:
                    permutation[r] = int(c)
                    permutated[b, :, r] = y2[b][:, c]
            perms.append(tuple(permutation))

    if squeeze:
        permutated = permutated[0]
    if return_cost:
        return permutated, perms, C if C is not None else cost_matrix()
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
    cost="mae",
) -> List[Tuple[int, int, Tuple]]:
    """Chunk-stitching graph: permutation of each chunk vs its neighbors.

    Returns [(chunk_i, chunk_j, perm)] for overlapping chunk pairs, used by
    stitching-based pipelines (parity: permutation.py:199-275). ``cost``
    follows the reference default (mae_cost_func, permutation.py:202);
    a callable receives ``onset=`` like the reference's partial binding
    (mae/mse ignore it, exactly as mae_cost_func's **kwargs does).
    """
    from functools import partial

    from ..core.segment import SlidingWindowFeature
    assert isinstance(segmentations, SlidingWindowFeature)
    cost_func = partial(cost, onset=onset) if callable(cost) else cost
    data = segmentations.data
    window = segmentations.sliding_window
    num_chunks, num_frames, _ = data.shape
    overlap_chunks = int(np.floor(window.duration / window.step)) - 1
    edges = []
    for i in range(num_chunks):
        for j in range(i + 1, min(i + 1 + overlap_chunks, num_chunks)):
            # round the FULL product per pair (reference permutation.py:241)
            shift = round((j - i) * num_frames * window.step
                          / window.duration)
            a = data[i][shift:]
            b = data[j][:a.shape[0]]
            if a.shape[0] == 0:
                continue
            _, perms = permutate(a, b, cost_func=cost_func)
            edges.append((i, j, perms[0]))
    return edges
