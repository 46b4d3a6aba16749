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
    """Resolve a Model from an instance / path / {checkpoint, subfolder}.

    ``token``/``cache_dir`` reach Model.from_pretrained so gated hub
    checkpoints authenticate (reference getter.py:74-131)."""
    if isinstance(model, Model):
        return model
    if isinstance(model, Mapping):
        token = model.get("token", token)
        cache_dir = model.get("cache_dir", cache_dir)
        checkpoint = model["checkpoint"]
        if Path(checkpoint).exists():
            checkpoint = Path(checkpoint)
            if model.get("subfolder"):
                checkpoint = checkpoint / model["subfolder"]
            return Model.from_pretrained(checkpoint, token=token,
                                         cache_dir=cache_dir)
        # hub id: keep subfolder/revision separate for the remote layout
        return Model.from_pretrained(
            checkpoint, subfolder=model.get("subfolder"),
            revision=model.get("revision"), token=token,
            cache_dir=cache_dir)
    return Model.from_pretrained(model, token=token, cache_dir=cache_dir)


def get_plda(plda, token=None, cache_dir=None) -> PLDA:
    if plda is None:
        raise ValueError(
            "VBx clustering requires a PLDA checkpoint: pass "
            "plda=<path-or-hub-id> (a directory holding "
            "xvec_transform.npz + plda.npz) to the pipeline")
    if isinstance(plda, PLDA):
        return plda
    if isinstance(plda, Mapping):
        return PLDA.from_pretrained(plda["checkpoint"],
                                    subfolder=plda.get("subfolder", ""),
                                    token=plda.get("token", token),
                                    cache_dir=plda.get("cache_dir",
                                                       cache_dir))
    return PLDA.from_pretrained(plda, token=token, cache_dir=cache_dir)


def get_pipeline(pipeline, token=None, cache_dir=None):
    from ...core.pipeline import Pipeline
    if isinstance(pipeline, Pipeline):
        return pipeline
    return Pipeline.from_pretrained(pipeline, token=token,
                                    cache_dir=cache_dir)


def get_calibration(calibration, token=None, cache_dir=None):
    from ...core.calibration import Calibration
    if isinstance(calibration, Calibration):
        return calibration
    if isinstance(calibration, Mapping):
        path = Path(calibration["checkpoint"])
        if path.exists():
            if calibration.get("subfolder"):
                path = path / calibration["subfolder"]
            return Calibration.from_file(path / "calibration.safetensors")
        return Calibration.from_pretrained(
            calibration["checkpoint"],
            subfolder=calibration.get("subfolder"),
            token=calibration.get("token", token),
            cache_dir=calibration.get("cache_dir", cache_dir))
    path = Path(calibration)
    if path.exists():
        return Calibration.from_file(calibration)
    return Calibration.from_pretrained(calibration, token=token,
                                       cache_dir=cache_dir)


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
