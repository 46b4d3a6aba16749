"""Round-3 metric-layer overhaul tests.

Covers: one-dispatch threshold broadcast (reference functional
_der_update:84-162 tensor-threshold path), torchmetrics forward contract
(__call__ = batch value, compute = aggregate), EER tied-score grouping
(det_curve semantics), overlapping SlidingDiarizationErrorRate with
aggregated components (reference utils/metric.py:245-286), and the
MacroAverageFMeasure dedupe.
"""

import numpy as np
import pytest

from pyannote_audio_tpu.metrics.streaming import (
    DiarizationErrorRate, EqualErrorRate, FalseAlarmRate,
    MissedDetectionRate, OptimalDiarizationErrorRate, der_compute,
    der_update, det_curve, diarization_error_rate,
    optimal_diarization_error_rate)


def _random_batch(seed=0, B=2, F=40, K=3):
    rng = np.random.default_rng(seed)
    preds = rng.uniform(size=(B, F, K)).astype(np.float32)
    target = (rng.uniform(size=(B, F, K)) > 0.6).astype(np.float32)
    return preds, target


# ------------------------------------------------- threshold broadcast

def test_der_update_vector_threshold_matches_scalar_loop():
    preds, target = _random_batch()
    thresholds = np.linspace(0.0, 1.0, 11)
    fa_v, miss_v, conf_v, total_v = der_update(preds, target,
                                               threshold=thresholds)
    fa_v, miss_v, conf_v = map(np.asarray, (fa_v, miss_v, conf_v))
    assert fa_v.shape == (11,)
    for i, t in enumerate(thresholds):
        fa, miss, conf, total = der_update(preds, target,
                                           threshold=float(t))
        assert float(fa) == pytest.approx(float(fa_v[i]), abs=1e-5)
        assert float(miss) == pytest.approx(float(miss_v[i]), abs=1e-5)
        assert float(conf) == pytest.approx(float(conf_v[i]), abs=1e-5)
        assert float(total) == pytest.approx(float(total_v), abs=1e-5)


def test_optimal_der_single_update_matches_sweep():
    preds, target = _random_batch(seed=1)
    metric = OptimalDiarizationErrorRate()
    metric.update(preds, target)
    best, best_t = optimal_diarization_error_rate(preds, target)
    assert metric.compute() == pytest.approx(best, abs=1e-6)
    assert metric.optimal_threshold == pytest.approx(best_t, abs=1e-6)
    # optimal <= DER at the default 0.5 threshold, by definition
    assert metric.compute() <= diarization_error_rate(
        preds, target, threshold=0.5) + 1e-6


def test_optimal_der_meaningful_on_soft_scores():
    # soft scores must yield different components across thresholds
    # (the round-2 bug was sweeping thresholds over hard {0,1} outputs)
    preds, target = _random_batch(seed=2)
    m = OptimalDiarizationErrorRate()
    m.update(preds, target)
    ders = (m.false_alarm + m.missed_detection + m.speaker_confusion) \
        / m.speech_total
    assert np.std(ders) > 0.01


def test_optimal_der_is_one_dispatch_per_batch(monkeypatch):
    """The 51-threshold sweep runs ONE der-components evaluation per
    update (round-2 review: it used to be 51 dispatches + 204 syncs)."""
    import pyannote_audio_tpu.metrics.streaming as streaming

    calls = []
    real = streaming.der_components

    def counting(preds, target, thresholds):
        calls.append(np.asarray(thresholds).shape)
        return real(preds, target, thresholds)

    monkeypatch.setattr(streaming, "der_components", counting)
    preds, target = _random_batch(seed=6)
    metric = streaming.OptimalDiarizationErrorRate()
    metric.update(preds, target)
    assert calls == [(51,)]


def test_optimal_component_family():
    """Optimal{FalseAlarm,MissedDetection,SpeakerConfusion}Rate and
    OptimalDiarizationErrorRateThreshold evaluate at the DER-optimal
    threshold and decompose the optimal DER exactly (reference
    torchmetrics :364-419)."""
    from pyannote_audio_tpu.metrics.streaming import (
        OptimalDiarizationErrorRateThreshold, OptimalFalseAlarmRate,
        OptimalMissedDetectionRate, OptimalSpeakerConfusionRate)

    preds, target = _random_batch(seed=9)
    der = OptimalDiarizationErrorRate()
    thr = OptimalDiarizationErrorRateThreshold()
    fa = OptimalFalseAlarmRate()
    miss = OptimalMissedDetectionRate()
    conf = OptimalSpeakerConfusionRate()
    for m in (der, thr, fa, miss, conf):
        m.update(preds, target)
    assert thr.compute() == pytest.approx(der.optimal_threshold)
    assert fa.compute() + miss.compute() + conf.compute() \
        == pytest.approx(der.compute(), abs=1e-6)


# ------------------------------------------- torchmetrics forward contract

def test_forward_returns_batch_value_compute_returns_aggregate():
    preds1, target1 = _random_batch(seed=3)
    # second batch: perfect predictions
    target2 = (np.random.default_rng(4).uniform(size=(2, 40, 3)) > 0.5
               ).astype(np.float32)
    metric = DiarizationErrorRate()
    batch1 = metric(preds1, target1)
    batch2 = metric(target2, target2)
    assert batch2 == pytest.approx(0.0, abs=1e-6)       # batch value
    single = DiarizationErrorRate()
    single.update(preds1, target1)
    assert batch1 == pytest.approx(single.compute(), abs=1e-6)
    # aggregate mixes both batches: strictly between the two batch values
    agg = metric.compute()
    assert 0.0 < agg < batch1


def test_component_metrics_share_forward_contract():
    preds, target = _random_batch(seed=5)
    for cls in (FalseAlarmRate, MissedDetectionRate):
        m = cls()
        v1 = m(preds, target)
        m(target, target)  # perfect batch
        assert m.compute() < v1 + 1e-9


# ----------------------------------------------------- EER tie grouping

def test_det_curve_groups_ties():
    # four trials share score 0.5: they must flip TOGETHER
    scores = np.array([0.9, 0.5, 0.5, 0.5, 0.5, 0.1])
    labels = np.array([1, 1, 1, 0, 0, 0])
    fpr, fnr, thr = det_curve(scores, labels)
    assert len(thr) == 3                      # 3 distinct scores
    assert list(thr) == [0.9, 0.5, 0.1]
    # after the 0.5 group flips: tp=3, fp=2 -> fnr=0, fpr=2/3
    assert fnr[1] == pytest.approx(0.0)
    assert fpr[1] == pytest.approx(2 / 3)


def test_eer_with_ties_matches_grouped_semantics():
    # all-same scores: only operating points are (fpr=0,fnr=1)->(1,0);
    # grouped EER must be 0.5 (cumsum-per-sample would understate it)
    metric = EqualErrorRate()
    metric.update(np.full(10, 0.7), np.array([1, 0] * 5))
    assert metric.compute() == pytest.approx(0.5, abs=1e-6)


def test_eer_separable_is_zero():
    metric = EqualErrorRate()
    metric.update(np.array([0.9, 0.8, 0.2, 0.1]),
                  np.array([1, 1, 0, 0]))
    assert metric.compute() == pytest.approx(0.0, abs=1e-6)


def test_eer_forward_returns_batch_value():
    metric = EqualErrorRate()
    v = metric(np.array([0.9, 0.8, 0.2, 0.1]), np.array([1, 1, 0, 0]))
    assert v == pytest.approx(0.0, abs=1e-6)
    # second (inseparable) batch returns ITS value, not the aggregate
    v2 = metric(np.array([0.1, 0.9]), np.array([1, 0]))
    assert v2 == pytest.approx(1.0, abs=0.51)  # fully reversed batch
    assert metric.compute() < v2               # aggregate mixes both


# ------------------------------------------------------- sliding DER

def test_sliding_der_overlapping_windows_cover_tail():
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.utils.metric import SlidingDiarizationErrorRate

    frames = SlidingWindow(start=0.0, duration=0.1, step=0.1)
    ref = np.zeros((95, 2), np.float32)
    ref[:50, 0] = 1
    ref[40:95, 1] = 1
    hyp = ref.copy()
    # error ONLY in the tail (frames 90-95) that non-overlapping
    # fixed-grid windows (window=10s -> 100 frames > 95) would drop
    hyp[90:95, 1] = 0
    metric = SlidingDiarizationErrorRate(window=3.0)   # 30-frame windows
    value = metric(SlidingWindowFeature(ref, frames),
                   SlidingWindowFeature(hyp, frames))
    assert value > 0.0                  # tail error is seen
    assert np.isscalar(value)
    # windows overlap 50%: ~ n/(w/2) windows, not n/w
    assert len(metric.windowed_) >= 5


def test_sliding_der_perfect_is_zero():
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.utils.metric import SlidingDiarizationErrorRate

    frames = SlidingWindow(start=0.0, duration=0.1, step=0.1)
    ref = (np.random.default_rng(0).uniform(size=(73, 3)) > 0.5
           ).astype(np.float32)
    metric = SlidingDiarizationErrorRate(window=2.0)
    assert metric(SlidingWindowFeature(ref, frames),
                  SlidingWindowFeature(ref.copy(), frames)) \
        == pytest.approx(0.0, abs=1e-9)


# ------------------------------------------------- MacroF dedupe

def test_macro_fmeasure_single_class_definition():
    from pyannote_audio_tpu.pipelines.multilabel import (
        MacroAverageFMeasure as PipelineMacroF)
    from pyannote_audio_tpu.utils.metric import (
        MacroAverageFMeasure as UtilsMacroF)
    assert PipelineMacroF is UtilsMacroF


def test_macro_fmeasure_annotation_based():
    from pyannote_audio_tpu.core.annotation import Annotation
    from pyannote_audio_tpu.core.segment import Segment
    from pyannote_audio_tpu.utils.metric import MacroAverageFMeasure

    ref = Annotation(uri="f")
    ref[Segment(0, 10), 0] = "speech"
    ref[Segment(2, 4), 1] = "music"
    metric = MacroAverageFMeasure(["speech", "music"])
    assert metric(ref, ref) == pytest.approx(1.0, abs=1e-6)
