"""Local stand-in for the pyannoteAI API.

Parity: /root/reference/src/pyannote/audio/pipelines/pyannoteai/local.py
(Local :32): same interface as the SDK wrapper but backed by the local
open-source diarization pipeline, so code written against the cloud API
runs unchanged.
"""

from __future__ import annotations

from typing import Optional, Union

from ...core.io import AudioFile
from ...core.pipeline import Pipeline
from ..speaker_diarization import DiarizeOutput, SpeakerDiarization


class Local(Pipeline):
    def __init__(self, pipeline: Union[SpeakerDiarization, str, dict],
                 **kwargs):
        super().__init__()
        if isinstance(pipeline, SpeakerDiarization):
            self._pipeline = pipeline
        else:
            loaded = Pipeline.from_pretrained(pipeline)
            if not isinstance(loaded, SpeakerDiarization):
                raise ValueError(
                    "Local expects a SpeakerDiarization pipeline")
            self._pipeline = loaded

    def apply(self, file: AudioFile, num_speakers: Optional[int] = None,
              min_speakers: Optional[int] = None,
              max_speakers: Optional[int] = None,
              hook=None) -> DiarizeOutput:
        return self._pipeline.apply(
            self._pipeline.prepare_one(file), num_speakers=num_speakers,
            min_speakers=min_speakers, max_speakers=max_speakers,
            hook=hook)
