"""pyannoteAI wrappers: Local stand-in + SDK error contract."""

import numpy as np
import pytest

from pyannote_audio_tpu.core.io import Audio
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.pipelines.pyannoteai.local import Local
from pyannote_audio_tpu.pipelines.speaker_diarization import (
    DiarizeOutput, SpeakerDiarization)

from corpus import default_two_speaker_file


def _diarization_pipeline():
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    return pipeline


def test_local_wrapper_end_to_end(tmp_path):
    file = default_two_speaker_file(tmp_path / "x.wav")
    local = Local(_diarization_pipeline())
    output = local(dict(file), max_speakers=3)
    assert isinstance(output, DiarizeOutput)
    assert len(output.speaker_diarization.labels()) <= 3
    data = output.serialize()
    assert set(data) == {"diarization", "exclusive_diarization"}


def test_local_rejects_non_diarization_pipeline(tmp_path):
    import yaml
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0, classes=["speech"])
    seg.build()
    seg.save_checkpoint(tmp_path / "seg")
    config = {"pipeline": {
        "name": "pyannote_audio_tpu.pipelines.VoiceActivityDetection",
        "params": {"segmentation": "$model/seg", "batch_size": 8}},
        "params": {"onset": 0.5, "offset": 0.5,
                   "min_duration_on": 0.0, "min_duration_off": 0.0}}
    with open(tmp_path / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    with pytest.raises(ValueError):
        Local(str(tmp_path))


def test_sdk_requires_api_key():
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK
    with pytest.raises(Exception):
        sdk = SDK(token=None)
        sdk.diarize("/nonexistent.wav")
