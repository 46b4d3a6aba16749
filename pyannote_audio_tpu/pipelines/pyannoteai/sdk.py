"""pyannoteAI cloud API wrapper.

Parity: /root/reference/src/pyannote/audio/pipelines/pyannoteai/sdk.py
(SDK :33 — upload -> diarize -> retrieve -> DiarizeOutput). The official
``pyannoteai-sdk`` package is unavailable in this environment, so the
wrapper delegates to the native REST client in
:mod:`pyannote_audio_tpu.pipelines.pyannoteai.client` (same
upload/diarize/retrieve surface; base url injectable for offline tests).
Reaching the real endpoint requires network egress.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

from ...core.annotation import Annotation
from ...core.io import AudioFile
from ...core.pipeline import Pipeline
from ...core.segment import Segment
from ..speaker_diarization import DiarizeOutput
from .client import Client


class SDK(Pipeline):
    """Speaker diarization through the pyannoteAI web API.

    Parameters
    ----------
    model : str, optional
        pyannoteAI diarization model (default "precision-2").
    token : str, optional
        API key; defaults to the PYANNOTEAI_API_KEY environment variable.

    Usage (parity: reference sdk.py:46-50)
    -----
    >>> pipeline = SDK(token="{PYANNOTEAI_API_KEY}")
    >>> output = pipeline("/path/to/audio.wav")
    """

    def __init__(self, model: str = "precision-2",
                 token: Optional[str] = None, **kwargs):
        super().__init__()
        self.model = model
        self.token = token or os.environ.get("PYANNOTEAI_API_KEY")
        self._client: Optional[Client] = None

    @property
    def client(self) -> Client:
        if self._client is None:
            self._client = Client(self.token)
        return self._client

    def _deserialize(self, diarization: List[Dict]) -> Annotation:
        annotation = Annotation()
        for t, turn in enumerate(diarization):
            annotation[Segment(turn["start"], turn["end"]), t] = \
                turn["speaker"]
        return annotation.rename_tracks("string")

    def apply(self, file: AudioFile, hook=None,
              num_speakers: Optional[int] = None,
              min_speakers: Optional[int] = None,
              max_speakers: Optional[int] = None) -> DiarizeOutput:
        """Upload `file`, run a diarization job, deserialize its output.

        Raises PyannoteAIFailedJob / PyannoteAICanceledJob on job
        failure, urllib HTTPError on transport errors (parity:
        reference sdk.py:96-106). ``hook`` is accepted for the base
        Pipeline.__call__ contract (remote jobs expose no step-level
        progress, so it is unused).
        """
        del hook
        if self.token is None:
            raise RuntimeError(
                "pyannoteAI API key missing: set PYANNOTEAI_API_KEY or "
                "pass token=...")
        media_url = self.client.upload(file)
        job_id = self.client.diarize(
            media_url, num_speakers=num_speakers,
            min_speakers=min_speakers, max_speakers=max_speakers,
            confidence=False, model=self.model, exclusive=True)
        job_output = self.client.retrieve(job_id)
        output = job_output["output"]
        return DiarizeOutput(
            speaker_diarization=self._deserialize(output["diarization"]),
            exclusive_speaker_diarization=self._deserialize(
                output["exclusiveDiarization"]),
        )
