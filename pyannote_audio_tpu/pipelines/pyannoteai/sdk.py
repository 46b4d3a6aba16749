"""pyannoteAI cloud API wrapper.

Parity: /root/reference/src/pyannote/audio/pipelines/pyannoteai/sdk.py
(SDK :33 — upload -> diarize -> retrieve -> DiarizeOutput). The official
``pyannoteai-sdk`` client and network access are unavailable in this
environment; the API surface (constructor, apply signature, deserialization
into DiarizeOutput) is kept so downstream code type-checks, and calls fail
with an actionable error.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from ...core.annotation import Annotation
from ...core.io import AudioFile
from ...core.pipeline import Pipeline
from ...core.segment import Segment
from ..speaker_diarization import DiarizeOutput


class SDK(Pipeline):
    def __init__(self, model: str = "precision-2",
                 token: Optional[str] = None, **kwargs):
        super().__init__()
        self.model = model
        self.token = token or os.environ.get("PYANNOTEAI_API_KEY")
        self._client = None

    def _deserialize(self, diarization: List[Dict]) -> Annotation:
        annotation = Annotation()
        for t, turn in enumerate(diarization):
            annotation[Segment(turn["start"], turn["end"]), t] = \
                turn["speaker"]
        return annotation

    def apply(self, file: AudioFile, num_speakers: Optional[int] = None,
              min_speakers: Optional[int] = None,
              max_speakers: Optional[int] = None) -> DiarizeOutput:
        if self.token is None:
            raise RuntimeError(
                "pyannoteAI API key missing: set PYANNOTEAI_API_KEY or "
                "pass token=...")
        raise RuntimeError(
            "the pyannoteAI web API requires network access, which this "
            "environment does not provide; use the local "
            "SpeakerDiarization pipeline instead.")
