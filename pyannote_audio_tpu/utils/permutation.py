"""Parity alias: reference path utils/permutation -> ops.permutation."""

from ..ops.permutation import (build_permutation_graph, pairwise_cost,
                               permutate, permutate_jax, permutation_table)

__all__ = ["permutate", "permutate_jax", "pairwise_cost",
           "permutation_table", "build_permutation_graph"]
