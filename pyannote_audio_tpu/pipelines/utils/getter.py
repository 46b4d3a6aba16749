"""Polymorphic loading of models / pipelines / PLDA / calibration.

Parity: /root/reference/src/pyannote/audio/pipelines/utils/getter.py
(get_model :74, get_pipeline :37, get_calibration :145, get_plda :201,
get_augmentation :250). Hub downloads are not available in this
environment; checkpoint dicts point at local snapshot directories instead.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Text, Union

from ...core.model import Model
from ...core.plda import PLDA

PipelineModel = Union[Model, Text, Mapping]


def get_model(model: PipelineModel, token=None, cache_dir=None) -> Model:
    """Resolve a Model from an instance / path / {checkpoint, subfolder}."""
    if isinstance(model, Model):
        return model
    if isinstance(model, Mapping):
        checkpoint = Path(model["checkpoint"])
        if "subfolder" in model and model["subfolder"]:
            checkpoint = checkpoint / model["subfolder"]
        return Model.from_pretrained(checkpoint)
    return Model.from_pretrained(model)


def get_plda(plda, token=None, cache_dir=None) -> PLDA:
    if isinstance(plda, PLDA):
        return plda
    if isinstance(plda, Mapping):
        return PLDA.from_pretrained(plda["checkpoint"],
                                    subfolder=plda.get("subfolder", ""))
    return PLDA.from_pretrained(plda)


def get_pipeline(pipeline, token=None, cache_dir=None):
    from ...core.pipeline import Pipeline
    if isinstance(pipeline, Pipeline):
        return pipeline
    return Pipeline.from_pretrained(pipeline)


def get_calibration(calibration, token=None, cache_dir=None):
    from ...core.calibration import Calibration
    if isinstance(calibration, Calibration):
        return calibration
    if isinstance(calibration, Mapping):
        path = Path(calibration["checkpoint"])
        if calibration.get("subfolder"):
            path = path / calibration["subfolder"]
        return Calibration.from_file(path / "calibration.safetensors")
    return Calibration.from_file(calibration)


def get_augmentation(augmentation, token=None, cache_dir=None):
    """Resolve an augmentation spec: instance / name / {name, params}."""
    from ...augmentation.registry import get_augmentation as lookup
    if augmentation is None or callable(augmentation):
        return augmentation
    if isinstance(augmentation, str):
        spec = lookup(augmentation)
        if spec is None:
            raise ValueError(f"unknown augmentation {augmentation!r}")
        return spec.transform
    if isinstance(augmentation, Mapping):
        from ...core.pipeline import get_class_by_name
        Klass = get_class_by_name(
            augmentation["name"],
            default_module_name="pyannote_audio_tpu.augmentation")
        return Klass(**(augmentation.get("params") or {}))
    raise ValueError(f"cannot resolve augmentation {augmentation!r}")


def get_devices(needs: int = 1):
    """Round-robin over available accelerator devices (API parity)."""
    import jax
    devices = jax.devices()
    return [devices[i % len(devices)] for i in range(needs)]
