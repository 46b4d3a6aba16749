"""Round-3 symbol-sweep additions: JaccardErrorRate, the programmatic CLI
surface (enums, parse_device, get_diarization, MinDurationOffOptimizer),
Task dataset views (TrainDataset/ValDataset/get_dtype), the ``binarize``
dispatcher, ``batchify``, and ``speaker_verification.main``.

Together with tests/test_api_parity.py this pins every public name the
reference exports (the AST sweep of reference src/ resolves 183/183).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyannote_audio_tpu.core.annotation import Annotation, Timeline
from pyannote_audio_tpu.core.segment import Segment


def _ann(uri, turns):
    ann = Annotation(uri=uri)
    for start, end, label in turns:
        ann[Segment(start, end)] = label
    return ann


# -- JaccardErrorRate ------------------------------------------------------

def test_jaccard_error_rate_hand_computed():
    from pyannote_audio_tpu.metrics.der import JaccardErrorRate

    reference = _ann("f", [(0, 10, "A"), (10, 20, "B")])
    hypothesis = _ann("f", [(0, 8, "X"), (12, 22, "Y")])
    metric = JaccardErrorRate()
    # X->A: inter 8 over union [0,10] -> 0.2; Y->B: inter 8 over union
    # [10,22] -> 4/12; average of the two reference speakers
    value = metric(reference, hypothesis)
    assert value == pytest.approx((0.2 + 4.0 / 12.0) / 2.0)
    assert abs(metric) == pytest.approx(value)


def test_jaccard_unmapped_reference_speaker_scores_one():
    from pyannote_audio_tpu.metrics.der import JaccardErrorRate

    reference = _ann("f", [(0, 10, "A"), (30, 35, "C")])
    hypothesis = _ann("f", [(0, 10, "X")])
    metric = JaccardErrorRate()
    assert metric(reference, hypothesis) == pytest.approx((0.0 + 1.0) / 2.0)
    detail = JaccardErrorRate()(reference, hypothesis, detailed=True)
    assert detail["speaker count"] == 2
    assert detail["speaker error"] == pytest.approx(1.0)


def test_jaccard_accumulates_and_resets():
    from pyannote_audio_tpu.metrics.der import JaccardErrorRate

    perfect = _ann("f", [(0, 10, "A")])
    metric = JaccardErrorRate()
    metric(perfect, _ann("f", [(0, 10, "X")]))
    metric(_ann("g", [(0, 10, "A")]), _ann("g", [(0, 5, "X")]))
    # speaker 1: jer 0; speaker 2: union 10 inter 5 -> 0.5
    assert abs(metric) == pytest.approx(0.25)
    metric.reset()
    assert abs(metric) == 0.0


# -- CLI programmatic surface ---------------------------------------------

def test_cli_enums_and_metric_factory():
    from pyannote_audio_tpu.__main__ import Device, Metric, NumSpeakers, Subset
    from pyannote_audio_tpu.metrics.der import (DiarizationErrorRate,
                                                JaccardErrorRate)

    assert Subset.development.value == "development"
    assert Device.AUTO.value == "auto"
    assert NumSpeakers.ORACLE.value == "oracle"
    assert isinstance(Metric.from_str("DiarizationErrorRate"),
                      DiarizationErrorRate)
    assert isinstance(Metric.from_str("JaccardErrorRate"), JaccardErrorRate)
    with pytest.raises(ValueError):
        Metric.from_str("NoSuchMetric")


def test_parse_device_resolves_auto_to_platform():
    from pyannote_audio_tpu.__main__ import Device, parse_device

    assert parse_device(Device.CPU) == "cpu"
    assert parse_device("tpu") == "tpu"
    # on the CPU test mesh, auto must resolve to cpu
    assert parse_device(Device.AUTO) == "cpu"


def test_get_diarization_extracts_annotation():
    from pyannote_audio_tpu.__main__ import get_diarization
    from pyannote_audio_tpu.pipelines.speaker_diarization import DiarizeOutput

    ann = _ann("f", [(0, 1, "A")])
    assert get_diarization(ann) is ann
    out = DiarizeOutput(speaker_diarization=ann,
                        exclusive_speaker_diarization=ann)
    assert get_diarization(out) is ann
    with pytest.raises(ValueError):
        get_diarization({"not": "a diarization"})


def test_min_duration_off_optimizer_fills_gap():
    from pyannote_audio_tpu.__main__ import MinDurationOffOptimizer
    from pyannote_audio_tpu.metrics.der import DiarizationErrorRate

    reference = _ann("f", [(0, 10, "A")])
    gappy = _ann("f", [(0, 4.9, "A"), (5.1, 10, "A")])
    files = [{"annotation": reference,
              "annotated": Timeline([Segment(0, 10)], uri="f"),
              "speaker_diarization": gappy}]
    best_collar, report = MinDurationOffOptimizer()(
        files, DiarizationErrorRate())
    # filling the 0.2 s within-speaker gap zeroes the miss
    assert best_collar >= 0.2
    assert report["diarization error rate"] == pytest.approx(0.0, abs=1e-9)
    assert "best_speaker_diarization" in files[0]
    assert files[0]["best_speaker_diarization"].get_timeline().duration() \
        == pytest.approx(10.0)


def test_programmatic_commands_exist():
    from pyannote_audio_tpu import __main__ as cli

    for name in ("apply", "benchmark", "optimize", "download", "strip"):
        assert callable(getattr(cli, name))


# -- Task dataset views ----------------------------------------------------

def test_get_dtype_bounds():
    from pyannote_audio_tpu.core.task import get_dtype

    assert get_dtype(0) == "b"
    assert get_dtype(126) == "b"
    assert get_dtype(127) == "i2"
    assert get_dtype(40_000) == "i"
    assert get_dtype(3_000_000_000) == "i8"
    assert get_dtype(-40_000) == "i"


def _debug_protocol(root):
    from corpus import default_two_speaker_file, make_file

    from pyannote_audio_tpu.utils.database import Protocol

    train_files = [
        default_two_speaker_file(root / "trn00.wav"),
        make_file(root / "trn01.wav",
                  [("carol", 0.5, 4.0), ("dave", 5.0, 9.5)],
                  duration=10.0, seed=1),
    ]
    dev_files = [
        make_file(root / "dev00.wav",
                  [("alice", 1.0, 4.0), ("bob", 5.0, 9.0)],
                  duration=10.0, seed=2),
    ]
    return Protocol(name="Debug.SpeakerDiarization.Debug",
                    subsets={"train": train_files,
                             "development": dev_files})


def test_train_and_val_dataset_views(tmp_path):
    from pyannote_audio_tpu.core.task import TrainDataset, ValDataset
    from pyannote_audio_tpu.tasks.segmentation import VoiceActivityDetection

    protocol = _debug_protocol(tmp_path)
    task = VoiceActivityDetection(protocol, duration=2.0, batch_size=4)
    task.setup()

    val = ValDataset(task)
    assert len(val) > 0
    sample = val[0]
    assert sample["X"].ndim == 2        # (channels, samples)
    assert "y" in sample

    train = TrainDataset(task)
    assert len(train) == task.train__len__()
    it = iter(train)
    first = next(it)
    assert first["X"].shape == sample["X"].shape
    # deterministic: a fresh view replays the same epoch-0 stream
    again = next(iter(TrainDataset(task)))
    np.testing.assert_array_equal(first["X"], again["X"])


def test_pixit_val_dataset_iterates(tmp_path):
    from pyannote_audio_tpu.tasks.separation import PixIT, ValDataset

    protocol = _debug_protocol(tmp_path)
    task = PixIT(protocol, duration=2.0, batch_size=2)
    task.setup()
    ds = ValDataset(task)
    samples = list(ds)
    assert len(samples) == len(ds) > 0
    assert samples[0]["X"].ndim == 2


# -- binarize dispatcher / batchify ---------------------------------------

def test_binarize_dispatch():
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.utils.signal import binarize, binarize_ndarray

    # ndarray contract is (batch_size, num_frames), last-axis hysteresis
    scores = np.array([[0.9, 0.4, 0.2, 0.9]], dtype=np.float32)
    np.testing.assert_array_equal(
        binarize(scores, onset=0.6, offset=0.3),
        binarize_ndarray(scores, onset=0.6, offset=0.3))

    # SWF contract is (num_frames, num_classes): same numbers, frame axis
    # first — the dispatcher must transpose (reference signal.py:171-182)
    swf = SlidingWindowFeature(
        scores.T.copy(), SlidingWindow(duration=1.0, step=1.0, start=0.0))
    out = binarize(swf, onset=0.6, offset=0.3)
    assert isinstance(out, SlidingWindowFeature)
    np.testing.assert_array_equal(
        out.data.astype(bool),
        binarize_ndarray(scores, onset=0.6, offset=0.3).T)

    with pytest.raises(NotImplementedError):
        binarize([0.1, 0.9])


def test_batchify_pads_last_batch():
    from pyannote_audio_tpu.pipelines.speaker_diarization import batchify

    batches = list(batchify("ABCDEFG", 3))
    assert batches[0] == ("A", "B", "C")
    assert batches[2] == ("G", None, None)


# -- speaker_verification.main --------------------------------------------

def test_speaker_verification_main_end_to_end(tmp_path):
    from corpus import make_file

    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.pipelines.speaker_verification import main

    a = make_file(tmp_path / "a.wav", [("alice", 0.2, 4.8)],
                  duration=5.0, seed=0)
    b = make_file(tmp_path / "b.wav", [("alice", 0.2, 4.8)],
                  duration=5.0, seed=1)
    c = make_file(tmp_path / "c.wav", [("bob", 0.2, 4.8)],
                  duration=5.0, seed=2)

    class TrialProtocol:
        def test_trial(self):
            yield {"file1": a, "file2": b, "reference": 1}
            yield {"file1": a, "file2": c, "reference": 0}
            yield {"file1": b, "file2": c, "reference": 0}

    emb = SimpleEmbeddingModel()
    emb.build()
    eer = main(protocol=TrialProtocol(), subset="test", embedding=emb)
    assert 0.0 <= eer <= 1.0


def test_speaker_verification_main_requires_trials():
    from pyannote_audio_tpu.pipelines.speaker_verification import main

    class NoTrialProtocol:
        pass

    with pytest.raises(ValueError, match="trial"):
        main(protocol=NoTrialProtocol(), subset="test",
             embedding="debug-embedding")


def test_jaccard_ignores_speakers_outside_uem():
    """A reference speaker with no speech inside the scoring region is
    dropped (pyannote.metrics uemify semantics), not penalized 1.0."""
    from pyannote_audio_tpu.metrics.der import JaccardErrorRate

    reference = _ann("f", [(0, 10, "A"), (50, 55, "C")])
    hypothesis = _ann("f", [(0, 10, "X")])
    uem = Timeline([Segment(0, 20)], uri="f")
    metric = JaccardErrorRate()
    assert metric(reference, hypothesis, uem=uem) == pytest.approx(0.0)
    detail = JaccardErrorRate()(reference, hypothesis, uem=uem,
                                detailed=True)
    assert detail["speaker count"] == 1


def test_hub_id_shapes_and_no_network_for_bare_names(monkeypatch):
    from pyannote_audio_tpu.utils.hf_hub import (AssetFileName,
                                                 download_from_hf_hub,
                                                 looks_like_hub_id)

    assert looks_like_hub_id("acme/segmentation")
    assert looks_like_hub_id("pyannote/speaker-diarization-community-1")
    # bare names stay eligible for LOCAL snapshot-root resolution ...
    assert looks_like_hub_id("checkpoints")
    assert not looks_like_hub_id("./rel/path")
    assert not looks_like_hub_id("/abs/path/ckpt")
    # ... but must never reach the network: a typo'd local dir raises
    # immediately even with an unreachable endpoint (no urlopen attempt,
    # which would hang/timeout before this fast failure)
    monkeypatch.setenv("HF_ENDPOINT", "http://127.0.0.1:9")
    monkeypatch.setenv("PYANNOTE_TPU_HUB", "")
    with pytest.raises(FileNotFoundError, match="org/name"):
        download_from_hf_hub("checkpoints", AssetFileName.Pipeline)
