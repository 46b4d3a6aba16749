"""DER metric tests with hand-computed expectations."""

import numpy as np
import pytest

from pyannote_audio_tpu import Annotation, Segment, Timeline
from pyannote_audio_tpu.metrics.der import (  # noqa: F401
    diarization_error_rate_components,
    DiarizationErrorRate,
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


def test_detection_metric_classes():
    """Stateful DetectionErrorRate / F-measure accumulate across files."""
    from pyannote_audio_tpu.metrics.der import (
        DetectionErrorRate, DetectionPrecisionRecallFMeasure)
    ref = Annotation(uri="u")
    ref[Segment(0, 10)] = "A"
    hyp = Annotation(uri="u")
    hyp[Segment(0, 8)] = "X"       # 2s miss
    hyp[Segment(12, 14)] = "X"     # 2s false alarm
    der = DetectionErrorRate()
    rate = der(ref, hyp)
    assert rate == pytest.approx(4 / 10)
    # accumulate a perfect file: corpus rate halves the error mass
    der(ref, ref)
    assert abs(der) == pytest.approx(4 / 20)

    f = DetectionPrecisionRecallFMeasure()
    detail = f(ref, hyp, detailed=True)
    assert detail["precision"] == pytest.approx(8 / 10)
    assert detail["recall"] == pytest.approx(8 / 10)
    assert detail["fscore"] == pytest.approx(0.8)
    assert 0.8 < abs(f) <= 1.0 or abs(f) == pytest.approx(0.8)


def test_identification_error_rate():
    """Direct-label comparison (no optimal mapping)."""
    from pyannote_audio_tpu.metrics.der import IdentificationErrorRate
    ref = Annotation(uri="u")
    ref[Segment(0, 10)] = "speech"
    ref[Segment(5, 10)] = "music"
    hyp = Annotation(uri="u")
    hyp[Segment(0, 10)] = "speech"
    hyp[Segment(5, 8)] = "noise"    # confusion with music for 3s, miss 2s
    ier = IdentificationErrorRate()
    detail = ier(ref, hyp, detailed=True)
    assert detail["total"] == pytest.approx(15.0)
    assert detail["confusion"] == pytest.approx(3.0)
    assert detail["missed detection"] == pytest.approx(2.0)
    assert detail["false alarm"] == pytest.approx(0.0)
    assert abs(ier) == pytest.approx(5 / 15)


def test_vad_and_multilabel_get_metric():
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection
    from pyannote_audio_tpu.pipelines.multilabel import MacroAverageFMeasure
    vad = VoiceActivityDetection.__new__(VoiceActivityDetection)
    vad.fscore = False
    assert type(vad.get_metric()).__name__ == "DetectionErrorRate"
    assert vad.get_direction() == "minimize"
    vad.fscore = True
    assert type(vad.get_metric()).__name__ == \
        "DetectionPrecisionRecallFMeasure"
    assert vad.get_direction() == "maximize"

    ref = Annotation(uri="u")
    ref[Segment(0, 10)] = "speech"
    ref[Segment(2, 4)] = "music"
    macro = MacroAverageFMeasure(["speech", "music"])
    assert macro(ref, ref) == pytest.approx(1.0)
    assert abs(macro) == pytest.approx(1.0)


def test_duplicate_same_label_tracks_count_once():
    """Overlapping same-label reference tracks are ONE active speaker:
    confusion can never go negative (labels deduped per interval)."""
    ref = Annotation(uri="dup")
    ref[Segment(0, 10), "t1"] = "A"
    ref[Segment(3, 5), "t2"] = "A"       # overlapping duplicate of A
    hyp = Annotation(uri="dup")
    hyp[Segment(0, 10), "h"] = "h1"
    comp = diarization_error_rate_components(ref, hyp)
    assert comp.confusion >= 0.0
    assert comp.total == 10.0            # NOT 12: A counts once
    assert comp.der == 0.0               # h1 -> A, perfect


def test_collar_without_uem_scores_far_false_alarms():
    """collar > 0 with no uem: the scoring region is the union of the
    reference AND hypothesis extents, so a spurious hypothesis segment
    far outside the reference still counts as false alarm."""
    ref = Annotation(uri="fa")
    ref[Segment(0, 10), "t"] = "A"
    hyp = Annotation(uri="fa")
    hyp[Segment(0, 10), "h"] = "h1"
    hyp[Segment(20, 25), "h2"] = "h2"    # far-away false alarm
    comp = diarization_error_rate_components(ref, hyp, collar=0.5)
    assert comp.false_alarm >= 5.0 - 1e-9


def test_empty_reference_full_hypothesis_is_not_perfect():
    """Noise-only file: an always-on detector must not score 0.0."""
    import numpy as np

    from pyannote_audio_tpu.metrics.der import (DetectionErrorRate,
                                                IdentificationErrorRate)

    ref = Annotation(uri="noise")
    hyp = Annotation(uri="noise")
    hyp[Segment(0, 30), "h"] = "speech"
    det = DetectionErrorRate()
    assert det(ref, hyp) == np.inf
    ier = IdentificationErrorRate()
    assert ier(ref, hyp) == np.inf
    # and a silent hypothesis on a silent file IS perfect
    det2 = DetectionErrorRate()
    assert det2(ref, Annotation(uri="noise")) == 0.0


def test_skip_overlap_mapping_excludes_overlap_regions():
    """With skip_overlap the label mapping is computed on the extruded
    (overlap-free) region: overlap co-occurrence cannot flip it."""
    ref = Annotation(uri="ov")
    ref[Segment(0, 4), "t1"] = "A"       # A alone on [0, 4]
    ref[Segment(4, 20), "t2"] = "B"      # B alone on [4, 20]
    ref[Segment(4, 12), "t3"] = "A"      # A overlaps B on [4, 12]
    hyp = Annotation(uri="ov")
    hyp[Segment(0, 12), "h"] = "h1"      # co-occurs more with A if the
                                         # overlap region is counted
    comp = diarization_error_rate_components(ref, hyp, skip_overlap=True)
    # overlap-free co-occurrence: h1&A = 4 s ([0,4]), h1&B = 8 s
    # ([4,12] minus the overlap... [12,12]=0 -> B from [4,12] is overlap
    # region, so h1&B counts only where B is alone AND h1 active = none
    # after extrusion of [4,12]; h1&A = [0,4] -> maps h1 -> A
    # scored region: [0,4] (A) + [12,20] (B)
    assert comp.total == 12.0
    assert comp.der >= 0.0


# ------------------------------------------------- discretized-oracle fuzz

def _random_annotation(rng, labels, total=20.0, n=10):
    """Random annotation on a 10 ms grid; same-label segments never
    overlap (so track-overlap == label-overlap for skip_overlap)."""
    ann = Annotation(uri="f")
    last_end = {l: 0.0 for l in labels}
    for _ in range(n):
        lbl = labels[int(rng.integers(len(labels)))]
        start = round(float(rng.uniform(last_end[lbl],
                                        max(last_end[lbl] + 4.0,
                                            total - 2.0))), 2)
        dur = round(float(rng.uniform(0.2, 3.0)), 2)
        seg = Segment(start, min(round(start + dur, 2), total))
        if seg.duration <= 0:
            continue
        ann[seg, ann.new_track(seg)] = lbl
        last_end[lbl] = seg.end
    return ann


def _oracle_der(reference, hypothesis, collar=0.0, skip_overlap=False,
                dt=0.005, horizon=30.0):
    """Brute-force 5 ms frame DER with the same semantics as the
    interval sweep (Hungarian mapping on co-occurrence, collar-extruded
    scoring region). Boundaries sit on a 10 ms grid and frame midpoints
    on odd 2.5 ms multiples, so discretization is exact."""
    from scipy.optimize import linear_sum_assignment

    t = np.arange(int(horizon / dt)) * dt + dt / 2

    def activity(ann, labels):
        act = np.zeros((len(labels), len(t)), bool)
        for seg, _, lbl in ann.itertracks(yield_label=True):
            act[labels.index(lbl)] |= (t >= seg.start) & (t < seg.end)
        return act

    rl, hl = reference.labels(), hypothesis.labels()
    R, H = activity(reference, rl), activity(hypothesis, hl)
    mask = np.ones(len(t), bool)
    half = collar / 2.0
    if collar > 0:
        for seg in reference.itersegments():
            for b in (seg.start, seg.end):
                mask &= ~((t > b - half) & (t < b + half))
    if skip_overlap:
        overlap = R.sum(axis=0) >= 2
        if collar > 0:
            k = int(round(half / dt))
            overlap = np.convolve(overlap, np.ones(2 * k + 1),
                                  "same") > 0
        mask &= ~overlap
    Rm, Hm = R[:, mask], H[:, mask]
    O = (Rm.astype(float) @ Hm.T.astype(float)) * dt
    n_correct = np.zeros(Rm.shape[1])
    if O.size:
        rows, cols = linear_sum_assignment(-O)
        for i, j in zip(rows, cols):
            if O[i, j] > 0:
                n_correct += Rm[i] & Hm[j]
    n_ref = Rm.sum(axis=0)
    n_hyp = Hm.sum(axis=0)
    miss = np.maximum(n_ref - n_hyp, 0).sum() * dt
    fa = np.maximum(n_hyp - n_ref, 0).sum() * dt
    conf = (np.minimum(n_ref, n_hyp) - n_correct).sum() * dt
    total = n_ref.sum() * dt
    return (miss + fa + conf) / total if total else 0.0


@pytest.mark.parametrize("collar,skip_overlap",
                         [(0.0, False), (0.5, False), (0.0, True)])
def test_der_matches_discretized_oracle(collar, skip_overlap):
    """The exact interval sweep agrees with a brute-force 5 ms frame
    oracle on random annotations (20 seeds per config)."""
    for seed in range(20):
        rng = np.random.default_rng(seed)
        ref = _random_annotation(rng, ["A", "B", "C"])
        hyp = _random_annotation(rng, ["x", "y", "z", "w"])
        if not ref.labels():
            continue
        metric = DiarizationErrorRate(collar=collar,
                                      skip_overlap=skip_overlap)
        ours = metric(ref, hyp)
        oracle = _oracle_der(ref, hyp, collar=collar,
                             skip_overlap=skip_overlap)
        assert ours == pytest.approx(oracle, abs=2e-3), \
            (seed, ours, oracle)
