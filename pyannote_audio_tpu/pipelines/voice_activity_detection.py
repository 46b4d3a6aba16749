"""Voice activity detection pipeline.

Parity: /root/reference/src/pyannote/audio/pipelines/
voice_activity_detection.py: sliding-window VAD scores (max over speakers
for multi-speaker segmentation models), hysteresis binarization with
tunable onset/offset, and min-duration post-processing.
"""

from __future__ import annotations

from typing import Callable, Optional, Union

import numpy as np

from ..core.annotation import Annotation, Timeline
from ..core.inference import Inference
from ..core.io import AudioFile
from ..core.pipeline import Pipeline
from ..core.segment import SlidingWindowFeature
from ..utils.signal import Binarize
from .parameter import Uniform
from .utils.getter import PipelineModel, get_model


class OracleVoiceActivityDetection(Pipeline):
    """Perfect VAD from the reference annotation."""

    @staticmethod
    def apply(file: AudioFile, **kwargs) -> Annotation:
        speech: Timeline = file["annotation"].get_timeline().support()
        return speech.to_annotation()


class VoiceActivityDetection(Pipeline):
    """Parity: VoiceActivityDetection (reference vad pipeline :66-215)."""

    def __init__(
        self,
        segmentation: PipelineModel = None,
        fscore: bool = False,
        use_auth_token=None,
        token=None,
        cache_dir=None,
        **inference_kwargs,
    ):
        super().__init__()
        self.segmentation = segmentation
        self.fscore = fscore

        model = get_model(segmentation,
                          token=token if token is not None
                          else use_auth_token,
                          cache_dir=cache_dir)
        # max over speakers -> single "is anyone speaking" score
        inference_kwargs.setdefault(
            "pre_aggregation_hook",
            lambda scores: np.max(scores, axis=-1, keepdims=True))
        self._segmentation = Inference(model, **inference_kwargs)

        if model.specifications.powerset:
            self.onset = self.offset = 0.5
        else:
            self.onset = Uniform(0.0, 1.0)
            self.offset = Uniform(0.0, 1.0)
        self.min_duration_on = Uniform(0.0, 1.0)
        self.min_duration_off = Uniform(0.0, 1.0)

    def default_parameters(self):
        return {
            "onset": 0.5, "offset": 0.5,
            "min_duration_on": 0.0, "min_duration_off": 0.0,
        }

    def classes(self):
        return ["SPEECH"]

    def initialize(self):
        self._binarize = Binarize(
            onset=self.onset,
            offset=self.offset,
            min_duration_on=self.min_duration_on,
            min_duration_off=self.min_duration_off)

    def apply(self, file: AudioFile,
              hook: Optional[Callable] = None) -> Annotation:
        self.initialize()
        if hook is not None:
            hook("segmentation", None)
        if self.training and "training_cache/segmentation" in file:
            segmentations = file["training_cache/segmentation"]
        else:
            segmentations: SlidingWindowFeature = self._segmentation(file)
            if self.training:
                file["training_cache/segmentation"] = segmentations
        if hook is not None:
            hook("segmentation", segmentations)
        speech: Annotation = self._binarize(segmentations)
        speech.uri = file["uri"]
        return speech.rename_labels({label: "SPEECH"
                                     for label in speech.labels()})

    def get_metric(self):
        """DetectionErrorRate, or F-measure when fscore=True (parity:
        reference voice_activity_detection.py:207-213)."""
        from ..metrics.der import (DetectionErrorRate,
                                   DetectionPrecisionRecallFMeasure)
        if self.fscore:
            return DetectionPrecisionRecallFMeasure()
        return DetectionErrorRate()

    def get_direction(self):
        return "maximize" if self.fscore else "minimize"
