"""Multi-device inference tests over the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.parallel import make_mesh

from corpus import default_two_speaker_file


@pytest.fixture(scope="module")
def seg_model():
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    return model


def test_sharded_inference_matches_single_device(seg_model, tmp_path):
    import pyannote_audio_tpu as pat
    file = default_two_speaker_file(tmp_path / "x.wav")
    single = pat.Inference(seg_model, duration=5.0, step=1.0,
                           batch_size=8)(file)
    mesh = make_mesh()
    sharded = pat.Inference(seg_model, duration=5.0, step=1.0,
                            batch_size=8, mesh=mesh)(file)
    assert sharded.data.shape == single.data.shape
    np.testing.assert_allclose(sharded.data, single.data, atol=1e-4)


def test_sharded_diarization_pipeline(seg_model, tmp_path):
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    emb = SimpleEmbeddingModel()
    emb.build()
    file = default_two_speaker_file(tmp_path / "y.wav")
    mesh = make_mesh()
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8, mesh=mesh)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    output = pipeline(file, max_speakers=3)
    assert len(output.speaker_diarization.labels()) <= 3


def test_sharded_pipelined_batch_apply(seg_model, tmp_path):
    """The staged apply_batch composes with mesh-sharded forwards and
    matches sequential apply on every file."""
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    emb = SimpleEmbeddingModel()
    emb.build()
    files = []
    for i in range(2):
        f = default_two_speaker_file(tmp_path / f"b{i}.wav")
        f["uri"] = f"b{i}"
        files.append(f)
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8,
        mesh=make_mesh())
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    batch_out = pipeline([dict(f) for f in files], max_speakers=3)
    seq_out = [pipeline(dict(f), max_speakers=3) for f in files]
    for b, s in zip(batch_out, seq_out):
        assert list(b.speaker_diarization.itertracks(yield_label=True)) \
            == list(s.speaker_diarization.itertracks(yield_label=True))


def test_sharded_eval_step_matches_single_device(seg_model):
    """The psum-wired validation eval step (train/evaluate.py) returns
    identical DER components on an 8-device mesh and on one device."""
    from pyannote_audio_tpu.ops.powerset import Powerset
    from pyannote_audio_tpu.train.evaluate import (make_eval_step,
                                                   pad_eval_batch)

    powerset = Powerset(3, 2)
    rng = np.random.default_rng(0)
    B = 16
    X = rng.normal(size=(B, 1, 16000 * 2)).astype(np.float32)
    frames = seg_model.num_frames(16000 * 2)
    y = (rng.uniform(size=(B, frames, 3)) > 0.6).astype(np.float32)
    X, y, valid = pad_eval_batch(X[:13], y[:13], B)   # ragged tail mask

    single = make_eval_step(seg_model.apply_fn, powerset=powerset)
    sharded = make_eval_step(seg_model.apply_fn, powerset=powerset,
                             mesh=make_mesh())
    h1, s1 = single(seg_model.params, X, y, valid)
    h8, s8 = sharded(seg_model.params, X, y, valid)
    np.testing.assert_allclose(np.asarray(h8), np.asarray(h1),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1),
                               rtol=1e-5, atol=1e-4)
    # padded items contribute nothing: un-masking them adds soft false
    # alarms at threshold 0 (their zero targets already add no total)
    _, s_full = single(seg_model.params, X, y, np.ones(B, np.float32))
    assert np.asarray(s_full)[0] > np.asarray(s1)[0]
