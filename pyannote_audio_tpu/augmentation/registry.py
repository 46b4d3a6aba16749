"""Augmentation registry: attach input/output transforms to tasks.

Parity: /root/reference/src/pyannote/audio/augmentation/registry.py
(register_augmentation :32, forward-hook attach/detach :109-118). The
reference mutates models with torch forward hooks; here a registry of
named (input | target) transforms is consulted by Task.collate, which is
the functional equivalent — augmentations compose on the batch before it
reaches the jitted step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional

_REGISTRY: Dict[str, "AugmentationSpec"] = {}


@dataclass
class AugmentationSpec:
    name: str
    transform: Callable           # (X, y) -> (X, y)
    when: str = "input"           # "input" | "output"
    p: float = 1.0


def register_augmentation(name: str, transform: Callable,
                          when: str = "input", p: float = 1.0
                          ) -> AugmentationSpec:
    if when not in ("input", "output"):
        raise ValueError("when must be 'input' or 'output'")
    spec = AugmentationSpec(name=name, transform=transform, when=when, p=p)
    _REGISTRY[name] = spec
    return spec


def unregister_augmentation(name: str) -> None:
    _REGISTRY.pop(name, None)


def get_augmentation(name: str) -> Optional[AugmentationSpec]:
    return _REGISTRY.get(name)


def apply_augmentations(X, y, when: str = "input"):
    for spec in _REGISTRY.values():
        if spec.when == when:
            X, y = spec.transform(X, y)
    return X, y
