"""Powerset <-> multilabel codec, fully on-device.

Parity: /root/reference/src/pyannote/audio/utils/powerset.py (Powerset
module: build_mapping :80-109, to_multilabel :115-140, to_powerset :146-168,
permutation_mapping :170-241).

TPU-native design: the codec is a single constant (K_powerset, K) 0/1 matrix;
both conversions are one matmul (MXU-friendly) or an argmax + gather. The
mapping matrix is built once on host (tiny) and closed over by jitted fns.
"""

from __future__ import annotations

import itertools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_powerset_mapping(num_classes: int, max_set_size: int) -> np.ndarray:
    """(num_powerset_classes, num_classes) binary membership matrix.

    Rows ordered by set cardinality, then lexicographic combination order —
    matching the reference (powerset.py:80-109): row 0 = empty set, then
    singletons {0},{1},..., then pairs {0,1},{0,2},...
    """
    rows = []
    for size in range(max_set_size + 1):
        for combo in itertools.combinations(range(num_classes), size):
            row = np.zeros(num_classes, dtype=np.float32)
            row[list(combo)] = 1.0
            rows.append(row)
    return np.stack(rows, axis=0)


class Powerset:
    """Stateless powerset codec (host object holding device constants)."""

    def __init__(self, num_classes: int, max_set_size: int):
        self.num_classes = num_classes
        self.max_set_size = max_set_size
        self.mapping = jnp.asarray(
            build_powerset_mapping(num_classes, max_set_size))

    @property
    def num_powerset_classes(self) -> int:
        return int(self.mapping.shape[0])

    @property
    def cardinality(self) -> jnp.ndarray:
        """Size of each powerset class (parity: build_cardinality,
        reference utils/powerset.py:111-113)."""
        return jnp.sum(self.mapping, axis=-1)

    @property
    def powerset_classes(self) -> list:
        """Each powerset state as a set of multilabel class indices.

        Parity: powerset_classes (reference utils/powerset.py:58-78)."""
        return [set(np.flatnonzero(row).tolist())
                for row in np.asarray(self.mapping)]

    def build_mapping(self) -> jnp.ndarray:
        """Parity alias (reference utils/powerset.py:80-109); the mapping
        is precomputed at construction here."""
        return self.mapping

    def build_cardinality(self) -> jnp.ndarray:
        """Parity alias (reference utils/powerset.py:111-113)."""
        return self.cardinality

    def forward(self, powerset: jnp.ndarray, soft: bool = False
                ) -> jnp.ndarray:
        """Parity alias of :meth:`to_multilabel` (reference
        utils/powerset.py:142-144, the nn.Module forward)."""
        return self.to_multilabel(powerset, soft=soft)

    def to_multilabel(self, powerset: jnp.ndarray, soft: bool = False
                      ) -> jnp.ndarray:
        """(..., K_powerset) log-probs -> (..., K) multilabel scores.

        hard: one-hot argmax then lookup (exact 0/1 output).
        soft: exp(logprobs) @ mapping (marginal per-class probability).
        """
        if soft:
            return jnp.exp(powerset) @ self.mapping
        idx = jnp.argmax(powerset, axis=-1)
        return self.mapping[idx]

    def to_powerset(self, multilabel: jnp.ndarray) -> jnp.ndarray:
        """(..., K) hard multilabel -> (..., K_powerset) one-hot.

        Exact reference semantics (powerset.py:146-168):
        one_hot(argmax(multilabel @ mapping^T)). With the rows ordered by
        cardinality the argmax picks the exact matching state for any
        valid vector, AND maps a vector with MORE active classes than
        ``max_set_size`` to its best-overlap subset (e.g. (1,1,1) with
        max_set_size=2 -> {0,1}) instead of silently producing no match.
        """
        products = multilabel @ self.mapping.T
        idx = jnp.argmax(products, axis=-1)
        return jax.nn.one_hot(idx, self.num_powerset_classes,
                              dtype=multilabel.dtype)

    def permutation_mapping(self, perm: Tuple[int, ...]) -> jnp.ndarray:
        """Lift a multilabel class permutation to powerset-class indices.

        Reference orientation (_permutation_powerset, powerset.py:170-215;
        e.g. perm (1,0,2) -> [0,2,1,3,4,6,5], perm (1,2,0) ->
        [0,2,3,1,6,4,5]): ``perm_ps[j] = i`` where permuting the
        multilabel columns of state ``i`` by ``perm`` yields state ``j``.
        Equivalently, permuting a POWERSET score vector by gathering
        ``scores[..., perm_ps]`` moves each state's score to where the
        column-permuted state lands — matching the reference's documented
        table verbatim.
        """
        return jnp.asarray(self._permutation_mapping_np(perm))

    def _permutation_mapping_np(self, perm: Tuple[int, ...]) -> np.ndarray:
        mapping = np.asarray(self.mapping)
        permuted = mapping[:, list(perm)]
        powers = 2 ** np.arange(self.num_classes, dtype=np.int64)
        before = (mapping @ powers).astype(np.int64)
        after = (permuted @ powers).astype(np.int64)
        lookup = {c: i for i, c in enumerate(after)}
        return np.asarray([lookup[c] for c in before], dtype=np.int32)

    def all_permutation_mappings(self) -> jnp.ndarray:
        """(num_perms, K_powerset) table for all K! multilabel permutations.

        Used by the permutation-invariant powerset loss: instead of running a
        Hungarian solver per sample (reference speaker_diarization.py:402-485),
        we enumerate all K! permutations on-device (K <= 4 in practice).
        The table is built once per Powerset instance and cached as a HOST
        array (a traced device value must never be cached: it would leak a
        tracer across jit scopes); jnp.asarray of the constant is free at
        trace time.
        """
        cached = getattr(self, "_all_perm_tables", None)
        if cached is None:
            perms = list(itertools.permutations(range(self.num_classes)))
            cached = np.stack(
                [self._permutation_mapping_np(p) for p in perms], axis=0)
            self._all_perm_tables = cached
        return jnp.asarray(cached)
