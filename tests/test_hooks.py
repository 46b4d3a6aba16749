"""Pipeline hook tests: Artifact, Timing, Hooks composition."""

import time

import numpy as np
import pytest

from pyannote_audio_tpu.pipelines.utils.hook import (ArtifactHook, Hooks,
                                                     ProgressHook,
                                                     TimingHook)


def test_artifact_hook_captures():
    file = {}
    with ArtifactHook("segmentation") as hook:
        hook("segmentation", np.ones(3), file=file)
        hook("embeddings", np.zeros(3), file=file)  # not requested
    assert "segmentation" in file["artifact"]
    assert "embeddings" not in file["artifact"]
    np.testing.assert_array_equal(file["artifact"]["segmentation"],
                                  np.ones(3))


def test_artifact_hook_all_steps():
    file = {}
    with ArtifactHook() as hook:
        hook("a", 1, file=file)
        hook("b", 2, file=file)
    assert file["artifact"] == {"a": 1, "b": 2}


def test_timing_hook():
    file = {}
    with TimingHook() as hook:
        hook("step1", None, file=file)
        time.sleep(0.05)
        hook("step2", None, file=file)
        time.sleep(0.01)
        hook("step2", None, file=file)
    assert "step1" in file["timing"]
    assert file["timing"]["step1"] >= 0.04


def test_hooks_composition():
    file = {}
    calls = []

    def spy(name, artifact, file=None, total=None, completed=None):
        calls.append(name)

    with Hooks(ArtifactHook(), spy) as hook:
        hook("x", 42, file=file)
    assert calls == ["x"]
    assert file["artifact"]["x"] == 42


def test_progress_hook_smoke(capsys):
    with ProgressHook(transient=True) as hook:
        hook("step", None, total=2, completed=1)
        hook("step", None, total=2, completed=2)


def test_timing_hook_through_pipelined_batch(tmp_path):
    """Hooks keep per-file attribution when apply_batch stages device
    work across files (hook is bound to its file via setup_hook)."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
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

    files = []
    for i in range(2):
        f = default_two_speaker_file(tmp_path / f"h{i}.wav")
        f["uri"] = f"h{i}"
        files.append(f)
    with TimingHook() as timing:
        pipeline(files, max_speakers=3, hook=timing)
    # each file dict carries its own per-step timing record
    for f in files:
        assert "timing" in f, f["uri"]
        assert "segmentation" in f["timing"]
