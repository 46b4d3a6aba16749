"""Tests for metrics, signal processing, CLI, calibration, aux modules."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp


# ------------------------------------------------------------- binarize

def test_hysteresis_host():
    # reference contract: (batch_size, num_frames), scan the LAST axis
    from pyannote_audio_tpu.utils.signal import binarize_ndarray
    scores = np.array([[0.1, 0.8, 0.6, 0.4, 0.2, 0.8, 0.1]])
    out = binarize_ndarray(scores, onset=0.7, offset=0.3)
    np.testing.assert_array_equal(
        out[0], [False, True, True, True, False, True, False])
    # (batch,) ndarray initial_state (reference signal.py:116-118):
    # an in-band frame 0 keeps the provided state instead of the
    # midpoint default
    scores = np.array([[0.5, 0.8, 0.6, 0.4, 0.2, 0.8, 0.1]])
    out = binarize_ndarray(scores, onset=0.7, offset=0.3,
                           initial_state=np.array([False]))
    np.testing.assert_array_equal(
        out[0], [False, True, True, True, False, True, False])
    out = binarize_ndarray(scores, onset=0.7, offset=0.3,
                           initial_state=True)
    np.testing.assert_array_equal(
        out[0], [True, True, True, True, False, True, False])


def test_hysteresis_jax_matches_host():
    # device op scans axis 0 (frames-first); host scans the last axis
    from pyannote_audio_tpu.ops.binarize import hysteresis
    from pyannote_audio_tpu.utils.signal import binarize_ndarray
    rng = np.random.default_rng(0)
    scores = rng.uniform(size=(200, 5)).astype(np.float32)
    host = binarize_ndarray(scores.T, onset=0.7, offset=0.3).T
    dev = np.asarray(hysteresis(jnp.asarray(scores), 0.7, 0.3))
    np.testing.assert_array_equal(host, dev)


def test_binarize_to_annotation():
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.utils.signal import Binarize
    window = SlidingWindow(duration=0.1, step=0.1)
    scores = np.zeros((50, 1), np.float32)
    scores[10:20] = 0.9
    scores[30:32] = 0.9   # too short
    ann = Binarize(onset=0.5, offset=0.5, min_duration_on=0.5)(
        SlidingWindowFeature(scores, window))
    segs = list(ann.itersegments())
    assert len(segs) == 1
    assert abs(segs[0].duration - 1.0) < 0.15


def test_peak():
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.utils.signal import Peak
    window = SlidingWindow(duration=0.1, step=0.1)
    y = np.zeros((100, 1), np.float32)
    y[30] = 0.9
    y[70] = 0.8
    timeline = Peak(alpha=0.5, min_duration=1.0)(
        SlidingWindowFeature(y, window))
    assert len(timeline) == 3  # two boundaries -> three segments


# ------------------------------------------------------------- streaming

def test_streaming_der_perfect():
    from pyannote_audio_tpu.metrics.streaming import DiarizationErrorRate
    target = (np.random.default_rng(0).uniform(size=(2, 50, 3)) > 0.5
              ).astype(np.float32)
    metric = DiarizationErrorRate()
    assert metric(target, target) == pytest.approx(0.0)


def test_streaming_der_permutation_invariant():
    from pyannote_audio_tpu.metrics.streaming import DiarizationErrorRate
    target = (np.random.default_rng(0).uniform(size=(1, 50, 3)) > 0.5
              ).astype(np.float32)
    metric = DiarizationErrorRate()
    assert metric(target[:, :, [2, 0, 1]], target) == pytest.approx(0.0)


def test_streaming_der_components():
    from pyannote_audio_tpu.metrics.streaming import (FalseAlarmRate,
                                                      MissedDetectionRate)
    target = np.zeros((1, 10, 2), np.float32)
    target[0, :5, 0] = 1.0
    preds = np.zeros((1, 10, 2), np.float32)
    preds[0, :8, 0] = 1.0
    fa = FalseAlarmRate()
    assert fa(preds, target) == pytest.approx(3 / 5)
    miss = MissedDetectionRate()
    preds2 = np.zeros((1, 10, 2), np.float32)
    preds2[0, :3, 0] = 1.0
    assert miss(preds2, target) == pytest.approx(2 / 5)


def test_eer_symmetric():
    from pyannote_audio_tpu.metrics.streaming import EqualErrorRate
    rng = np.random.default_rng(0)
    pos = rng.normal(1.0, 0.5, 500)
    neg = rng.normal(-1.0, 0.5, 500)
    metric = EqualErrorRate()
    metric.update(np.concatenate([pos, neg]),
                  np.concatenate([np.ones(500), np.zeros(500)]))
    eer = metric.compute()
    assert 0.0 < eer < 0.1


def test_discrete_der():
    from pyannote_audio_tpu.utils.metric import (
        DiscreteDiarizationErrorRate, discrete_diarization_error_rate)
    ref = np.zeros((20, 2))
    ref[:10, 0] = 1
    hyp = ref[:, [1, 0]]  # permuted
    parts = discrete_diarization_error_rate(ref, hyp)
    assert parts["diarization error rate"] == pytest.approx(0.0)
    metric = DiscreteDiarizationErrorRate()
    metric(ref, hyp)
    assert abs(metric) == pytest.approx(0.0)


# ------------------------------------------------------------- calibration

def test_calibration_roundtrip(tmp_path):
    from pyannote_audio_tpu.core.calibration import Calibration
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 2, 200)
    y = (x + 0.2 * rng.standard_normal(200) > 1.0).astype(float)
    cal = Calibration()
    cal.fit(x, y)
    path = tmp_path / "calibration.safetensors"
    cal.save(path)
    loaded = Calibration.from_file(path)
    scores = np.array([[0.1, np.nan], [1.5, 1.9]])
    out = loaded.safe_transform(scores)
    assert np.isnan(out[0, 1])
    assert 0 <= out[0, 0] <= out[1, 0] <= 1


# ------------------------------------------------------------- aux

def test_multi_task_map():
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.utils.multi_task import map_with_specifications
    s1 = Specifications(problem=Problem.BINARY_CLASSIFICATION,
                        resolution=Resolution.FRAME, classes=["x"])
    assert map_with_specifications(s1, lambda s: s.problem.name) == \
        "BINARY_CLASSIFICATION"
    out = map_with_specifications((s1, s1), lambda s, v: v * 2, [1, 2])
    assert out == (2, 4)


def test_mix_augmentation():
    from pyannote_audio_tpu.augmentation.mix import MixSpeakerDiarization
    rng = np.random.default_rng(0)
    X = rng.standard_normal((4, 1, 1000)).astype(np.float32)
    y = np.zeros((4, 10, 3), np.float32)
    y[0, :, 0] = 1
    y[1, :, 1] = 1
    y[2, :, 2] = 1
    y[3, :, :2] = 1
    mix = MixSpeakerDiarization(p=1.0, max_num_speakers=3, seed=0)
    X2, y2 = mix(X, y)
    assert X2.shape == X.shape
    assert (y2.any(axis=1).sum(axis=1) <= 3).all()


def test_telemetry_disabled_by_default(tmp_path, monkeypatch):
    monkeypatch.delenv("PYANNOTE_TPU_METRICS_ENABLED", raising=False)
    import pyannote_audio_tpu.telemetry.metrics as tm
    tm._STATE["enabled"] = None
    assert not tm.telemetry_enabled()
    tm.set_telemetry_metrics(True)
    assert tm.telemetry_enabled()
    tm.set_telemetry_metrics(False)


def test_sample_file():
    from pyannote_audio_tpu.sample import SAMPLE_FILE
    assert Path(SAMPLE_FILE["audio"]).exists()
    assert len(SAMPLE_FILE["annotation"].labels()) == 2


def test_dependency_check_warns():
    from pyannote_audio_tpu.utils.dependencies import check_dependencies
    with pytest.warns(UserWarning):
        check_dependencies({"nonexistent-package": "1.0"})


def test_protocol_check(tmp_path):
    from pyannote_audio_tpu.utils.database import Protocol
    from pyannote_audio_tpu.utils.protocol import check_protocol
    with pytest.raises(ValueError):
        check_protocol(Protocol(name="empty"))


# ------------------------------------------------------------- database

def test_database_yml_registry(tmp_path):
    from pyannote_audio_tpu.utils.database import (get_protocol,
                                                   register_database)
    rttm = tmp_path / "train.rttm"
    rttm.write_text(
        "SPEAKER file1 1 0.00 5.00 <NA> <NA> alice <NA> <NA>\n"
        "SPEAKER file1 1 6.00 3.00 <NA> <NA> bob <NA> <NA>\n")
    uem = tmp_path / "train.uem"
    uem.write_text("file1 1 0.00 10.00\n")
    db = tmp_path / "database.yml"
    db.write_text(f"""
Databases:
  TestDB: {tmp_path}/{{uri}}.wav
Protocols:
  TestDB:
    SpeakerDiarization:
      MyProto:
        train:
          annotation: {rttm}
          annotated: {uem}
""")
    register_database(db)
    protocol = get_protocol("TestDB.SpeakerDiarization.MyProto")
    files = list(protocol.train())
    assert len(files) == 1
    assert files[0]["uri"] == "file1"
    assert files[0]["annotation"].labels() == ["alice", "bob"]
    assert files[0]["audio"].endswith("file1.wav")


# ------------------------------------------------------------- probe

def test_probe_intermediates():
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.utils.probe import probe
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0, classes=["speech"])
    model.build()
    fn = probe(model, ["lstm"])
    out, taps = fn(np.zeros((1, 1, 16000), np.float32))
    assert any("lstm" in k for k in taps)


def test_orbax_checkpoint_roundtrip(tmp_path):
    from pyannote_audio_tpu.core.model import (Model, Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    m = SimpleSegmentationModel()
    m.specifications = Specifications(
        problem=Problem.BINARY_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0, classes=["speech"])
    m.build()
    m.save_checkpoint(tmp_path / "ck", use_orbax=True)
    m2 = Model.from_pretrained(tmp_path / "ck")
    x = np.zeros((1, 1, 16000), np.float32)
    np.testing.assert_array_equal(np.asarray(m(x)), np.asarray(m2(x)))


def test_trace_hook_smoke():
    from pyannote_audio_tpu.pipelines.utils.hook import TraceHook
    with TraceHook() as hook:   # no log dir: annotations only
        hook("stage_a", None)
        hook("stage_a", None)
        hook("stage_b", None)


def test_expand_subfolders():
    """$model placeholder expansion parity
    (reference tests/test_pipeline_subfolder.py:87-150)."""
    from pyannote_audio_tpu.core.pipeline import expand_subfolders

    # no references: untouched
    config = {"a": 1, "b": ["x", {"c": 2}]}
    assert expand_subfolders(config, "org/repo") == config

    # dict value
    out = expand_subfolders({"seg": "$model/seg"}, "org/repo")
    assert out == {"seg": {"checkpoint": "org/repo", "subfolder": "seg"}}

    # bare $model (no subfolder)
    out = expand_subfolders({"m": "$model"}, "org/repo")
    assert out == {"m": {"checkpoint": "org/repo"}}

    # explicit revision
    out = expand_subfolders({"m": "$model/emb@v2"}, "org/repo")
    assert out == {"m": {"checkpoint": "org/repo",
                         "subfolder": "emb", "revision": "v2"}}

    # list + nested dict references
    out = expand_subfolders({"models": ["$model/a", {"deep": "$model/b"}]},
                            "org/repo")
    assert out["models"][0] == {"checkpoint": "org/repo", "subfolder": "a"}
    assert out["models"][1]["deep"] == {"checkpoint": "org/repo",
                                        "subfolder": "b"}
