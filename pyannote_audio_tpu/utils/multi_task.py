"""Apply a function per Specifications (single- or multi-task models).

Parity: /root/reference/src/pyannote/audio/utils/multi_task.py
(map_with_specifications :29-59).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple, Union

from ..core.model import Specifications


def map_with_specifications(
    specifications: Union[Specifications, Tuple[Specifications, ...]],
    func: Callable,
    *iterables,
) -> Union[Any, Tuple[Any, ...]]:
    """Call ``func(spec, *items)`` once per specification."""
    if isinstance(specifications, Specifications):
        return func(specifications, *iterables)
    outputs = tuple(
        func(spec, *(it[i] for it in iterables))
        for i, spec in enumerate(specifications))
    return outputs
