"""Export TPU-trained models as reference-format checkpoints.

The inverse of ``Model.from_pretrained("pytorch_model.bin")``: writes a
lightning-style checkpoint exactly as the reference's
``on_save_checkpoint`` does (reference core/model.py:244-256 — a
``state_dict`` of torch tensors, ``hyper_parameters``, and the pickled
``pyannote.audio`` vendor block with architecture + Specifications), so
a model trained here deploys on the stock pyannote.audio stack.

The reference package is not importable in this environment, so
pickling the vendor block uses shim classes registered under the
reference's module path for the duration of the save (same Enum values
and dataclass fields as reference core/task.py:59-107; the real package
unpickles them as its own classes).
"""

from __future__ import annotations

import sys
import types
from contextlib import contextmanager
from dataclasses import dataclass
from enum import Enum
from pathlib import Path
from typing import List, Optional, Text, Tuple, Union

import numpy as np

_REF_MODULES = ("pyannote", "pyannote.audio", "pyannote.audio.core",
                "pyannote.audio.core.task")


@contextmanager
def reference_shims():
    """Register reference-shaped Problem/Resolution/Specifications under
    ``pyannote.audio.core.task`` so pickle stores them by the reference's
    import path; yields the shim classes."""

    class Problem(Enum):
        BINARY_CLASSIFICATION = 0
        MONO_LABEL_CLASSIFICATION = 1
        MULTI_LABEL_CLASSIFICATION = 2
        REPRESENTATION = 3
        REGRESSION = 4

    class Resolution(Enum):
        FRAME = 1
        CHUNK = 2

    @dataclass
    class Specifications:
        problem: Problem
        resolution: Resolution
        duration: float
        min_duration: Optional[float] = None
        warm_up: Optional[Tuple[float, float]] = (0.0, 0.0)
        classes: Optional[List[Text]] = None
        powerset_max_classes: Optional[int] = None
        permutation_invariant: bool = False

    created = []
    for name in _REF_MODULES:
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)
    mod = sys.modules["pyannote.audio.core.task"]
    replaced = {}
    for klass in (Problem, Resolution, Specifications):
        klass.__module__ = "pyannote.audio.core.task"
        klass.__qualname__ = klass.__name__
        if hasattr(mod, klass.__name__):
            replaced[klass.__name__] = getattr(mod, klass.__name__)
        setattr(mod, klass.__name__, klass)
    try:
        yield Specifications, Problem, Resolution
    finally:
        for name, old in replaced.items():
            setattr(mod, name, old)
        for name in created:
            del sys.modules[name]


def _shim_specifications(spec, Specifications, Problem, Resolution):
    return Specifications(
        problem=Problem[spec.problem.name],
        resolution=Resolution[spec.resolution.name],
        duration=spec.duration,
        min_duration=spec.min_duration,
        warm_up=tuple(spec.warm_up) if spec.warm_up else (0.0, 0.0),
        classes=list(spec.classes) if spec.classes else None,
        powerset_max_classes=spec.powerset_max_classes,
        permutation_invariant=getattr(spec, "permutation_invariant",
                                      False))


def export_reference_checkpoint(model, path: Union[str, Path]) -> Path:
    """Write ``model`` as a reference-loadable ``pytorch_model.bin``.

    Requires the architecture to implement ``export_torch_state_dict``
    (the inverse of its ``convert_torch_state_dict``) and declare its
    reference import path via ``REFERENCE_ARCHITECTURE``.
    """
    import torch

    from .. import __version__

    if not hasattr(model, "export_torch_state_dict"):
        raise NotImplementedError(
            f"{type(model).__name__} has no export_torch_state_dict; "
            "cannot export to the reference format")
    # copy=True: exported leaves may be non-writable jax-backed arrays
    state = {key: torch.from_numpy(np.array(value, copy=True))
             for key, value in model.export_torch_state_dict().items()}

    architecture = getattr(model, "REFERENCE_ARCHITECTURE", None)
    if architecture is None:
        # distributed as a plain state dict (e.g. WeSpeaker embeddings,
        # reference speaker_verification.py WeSpeaker backend)
        path = Path(path)
        if path.is_dir() or path.suffix == "":
            path.mkdir(parents=True, exist_ok=True)
            path = path / "pytorch_model.bin"
        torch.save(state, path)
        return path
    module_path, class_name = architecture

    from ..core.model import Specifications as OurSpecifications
    specs = model.specifications
    multi = not isinstance(specs, OurSpecifications)

    path = Path(path)
    if path.is_dir() or path.suffix == "":
        path.mkdir(parents=True, exist_ok=True)
        path = path / "pytorch_model.bin"
    with reference_shims() as (Spec, Problem, Resolution):
        shimmed = tuple(
            _shim_specifications(s, Spec, Problem, Resolution)
            for s in (specs if multi else (specs,)))
        hparams = model.export_torch_hparams() \
            if hasattr(model, "export_torch_hparams") \
            else dict(getattr(model, "hparams", None) or {})
        checkpoint = {
            "state_dict": state,
            "hyper_parameters": hparams,
            "pyannote.audio": {
                "versions": {"pyannote.audio": "3.4.0",
                             "pyannote_audio_tpu": __version__},
                "architecture": {"module": module_path,
                                 "class": class_name},
                "specifications": shimmed if multi else shimmed[0],
            },
        }
        torch.save(checkpoint, path)
    return path
