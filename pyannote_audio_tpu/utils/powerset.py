"""Parity alias: reference path utils/powerset -> ops.powerset."""

from ..ops.powerset import Powerset, build_powerset_mapping

__all__ = ["Powerset", "build_powerset_mapping"]
