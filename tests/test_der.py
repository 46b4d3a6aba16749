"""DER metric tests with hand-computed expectations."""

import numpy as np
import pytest

from pyannote_audio_tpu import Annotation, Segment, Timeline
from pyannote_audio_tpu.metrics.der import (DiarizationErrorRate,
                                            GreedyDiarizationErrorRate,
                                            detection_error_rate,
                                            diarization_error_rate,
                                            optimal_mapping)


def _ref():
    ann = Annotation(uri="f")
    ann[Segment(0, 10), "_"] = "A"
    ann[Segment(12, 20), "_"] = "B"
    return ann


def test_perfect():
    ref = _ref()
    hyp = _ref().rename_labels({"A": "spk1", "B": "spk2"})
    assert diarization_error_rate(ref, hyp) == pytest.approx(0.0)


def test_miss_only():
    ref = _ref()
    hyp = Annotation(uri="f")
    hyp[Segment(0, 10), "_"] = "x"
    # B missed entirely: miss=8, total=18
    assert diarization_error_rate(ref, hyp) == pytest.approx(8 / 18)


def test_false_alarm():
    ref = _ref()
    hyp = _ref().rename_labels({"A": "x", "B": "y"})
    hyp[Segment(25, 30), "_"] = "x"
    assert diarization_error_rate(ref, hyp) == pytest.approx(5 / 18)


def test_confusion():
    ref = _ref()
    hyp = Annotation(uri="f")
    hyp[Segment(0, 10), "_"] = "x"
    hyp[Segment(12, 16), "_"] = "x"   # confused with A's mapped label
    hyp[Segment(16, 20), "_"] = "y"
    # optimal: x->A, y->B; confusion on [12,16) = 4
    assert diarization_error_rate(ref, hyp) == pytest.approx(4 / 18)


def test_overlap_counting():
    ref = Annotation(uri="f")
    ref[Segment(0, 10), "a"] = "A"
    ref[Segment(5, 10), "b"] = "B"   # overlap [5,10)
    hyp = Annotation(uri="f")
    hyp[Segment(0, 10), "_"] = "x"
    # total = 15; [5,10) has 2 ref 1 hyp -> miss 5
    assert diarization_error_rate(ref, hyp) == pytest.approx(5 / 15)


def test_uem_restriction():
    ref = _ref()
    hyp = _ref().rename_labels({"A": "x", "B": "y"})
    hyp[Segment(25, 30), "_"] = "x"
    uem = Timeline([Segment(0, 20)])
    # false alarm outside UEM -> ignored
    assert diarization_error_rate(ref, hyp, uem=uem) == pytest.approx(0.0)


def test_collar():
    ref = _ref()
    hyp = Annotation(uri="f")
    hyp[Segment(0.2, 10), "_"] = "x"   # 0.2s miss at segment start
    hyp[Segment(12, 20), "_"] = "y"
    der_strict = diarization_error_rate(ref, hyp)
    assert der_strict > 0
    der_collar = diarization_error_rate(ref, hyp, collar=0.5)
    assert der_collar == pytest.approx(0.0)


def test_optimal_mapping():
    ref = _ref()
    hyp = _ref().rename_labels({"A": "spk1", "B": "spk2"})
    mapping = optimal_mapping(ref, hyp)
    assert mapping == {"spk1": "A", "spk2": "B"}


def test_accumulation():
    metric = DiarizationErrorRate()
    ref = _ref()
    hyp = _ref().rename_labels({"A": "x", "B": "y"})
    metric(ref, hyp)
    hyp2 = Annotation(uri="f")
    hyp2[Segment(0, 10), "_"] = "x"
    metric(ref, hyp2)
    # total 36, errors 8 (missed B in file 2)
    assert abs(metric) == pytest.approx(8 / 36)


def test_greedy_matches_hungarian_on_easy_case():
    ref = _ref()
    hyp = _ref().rename_labels({"A": "x", "B": "y"})
    g = GreedyDiarizationErrorRate()
    assert g(ref, hyp) == pytest.approx(0.0)


def test_detection_error_rate():
    ref = _ref()
    hyp = Annotation(uri="f")
    hyp[Segment(0, 10), "_"] = "anything"
    assert detection_error_rate(ref, hyp) == pytest.approx(8 / 18)
