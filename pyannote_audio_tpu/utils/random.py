"""Parity alias: reference path utils/random -> core.task RNG helper."""

from ..core.task import create_rng_for_worker

__all__ = ["create_rng_for_worker"]
