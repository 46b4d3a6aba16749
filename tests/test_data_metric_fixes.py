"""Regression tests for the data-model/metrics review fixes (round 3,
session 5, pass 4): SWF.crop out-of-range bounds, mix-augmentation
constraint, Timeline set semantics, rename_tracks generator, detection
collar, zero-support macro-F convention, augmentation probability."""

import numpy as np
import pytest

from pyannote_audio_tpu.core.annotation import Annotation, Timeline
from pyannote_audio_tpu.core.segment import (Segment, SlidingWindow,
                                             SlidingWindowFeature)


def _swf(n=10):
    data = np.arange(n, dtype=np.float32)[:, None]
    return SlidingWindowFeature(
        data, SlidingWindow(duration=2.0, step=1.0, start=0.0))


def test_swf_crop_focus_before_extent_is_empty():
    out = _swf().crop(Segment(-10.0, -5.0))
    assert out.shape[0] == 0          # was a wrap-around negative slice


def test_swf_crop_fixed_fully_outside_keeps_frame_count():
    swf = _swf()
    after = swf.crop(Segment(20.0, 25.0), fixed=5.0)
    before = swf.crop(Segment(-25.0, -20.0), fixed=5.0)
    inside = swf.crop(Segment(2.0, 7.0), fixed=5.0)
    assert after.shape[0] == before.shape[0] == inside.shape[0]
    np.testing.assert_array_equal(after, 0.0)     # zero-filled
    np.testing.assert_array_equal(before, 0.0)


def test_swf_crop_fixed_partial_overlap_edge_repeats():
    swf = _swf()
    out = swf.crop(Segment(-3.0, 2.0), fixed=5.0)
    ref = swf.crop(Segment(2.0, 7.0), fixed=5.0)
    assert out.shape == ref.shape
    # frames before the extent edge-repeat frame 0
    np.testing.assert_array_equal(out[:4].ravel(), np.zeros(4))
    np.testing.assert_array_equal(out[4:].ravel(), [0.0, 1.0, 2.0])


def test_mix_speaker_diarization_sum_constraint():
    """Two chunks with 2 speakers each occupy the same label columns;
    their UNION is 2 but they are 4 distinct people — with
    max_num_speakers=3 they must never be mixed (reference constrains
    on the SUM, mix.py:125)."""
    from pyannote_audio_tpu.augmentation.mix import MixSpeakerDiarization

    rng_wave = np.random.default_rng(0)
    X = rng_wave.standard_normal((4, 1, 160)).astype(np.float32)
    y = np.zeros((4, 20, 3), np.float32)
    y[:, :, :2] = 1.0                      # every sample: 2 speakers
    mix = MixSpeakerDiarization(p=1.0, max_num_speakers=3, seed=1)
    X_out, y_out = mix(X, y)
    np.testing.assert_array_equal(X_out, X)    # no candidates -> no mix
    np.testing.assert_array_equal(y_out, y)


def test_mix_speaker_diarization_shifts_into_free_columns():
    """1+1 speakers in the SAME column must merge into TWO columns —
    they are different people."""
    from pyannote_audio_tpu.augmentation.mix import MixSpeakerDiarization

    X = np.ones((2, 1, 160), np.float32)
    y = np.zeros((2, 20, 3), np.float32)
    y[0, :10, 0] = 1.0
    y[1, 5:15, 0] = 1.0
    mix = MixSpeakerDiarization(p=1.0, max_num_speakers=2, seed=0)
    _, y_out = mix(X, y)
    mixed = [i for i in range(2)
             if (y_out[i].any(axis=0).sum() == 2)]
    assert mixed, "at least one sample must have gained a NEW column"
    i = mixed[0]
    # original column untouched, partner's speaker in a free column
    np.testing.assert_array_equal(y_out[i][:, 0], y[i][:, 0])


def test_timeline_set_semantics():
    s = Segment(1.0, 2.0)
    tl = Timeline([s, s])
    assert len(tl) == 1
    tl.add(s)
    assert len(tl) == 1
    assert tl == Timeline([s])


def test_rename_tracks_generator():
    ann = Annotation(uri="x")
    ann[Segment(0, 1), "t0"] = "alice"
    ann[Segment(1, 2), "t1"] = "bob"
    renamed = ann.rename_tracks(generator="string")
    tracks = [trk for _, trk in renamed.itertracks()]
    assert tracks == ["A", "B"]
    renamed_int = ann.rename_tracks(generator="int")
    assert [trk for _, trk in renamed_int.itertracks()] == [0, 1]


def test_detection_error_rate_honors_collar():
    from pyannote_audio_tpu.metrics.der import DetectionErrorRate

    ref = Annotation(uri="f")
    ref[Segment(0.0, 10.0), 0] = "speech"
    hyp = Annotation(uri="f")
    hyp[Segment(0.1, 10.0), 0] = "speech"   # 0.1 s late onset
    # without collar: 0.1 s missed
    no_collar = DetectionErrorRate()(ref, hyp)
    assert no_collar == pytest.approx(0.01, abs=1e-6)
    # a 0.5 s collar around reference boundaries swallows the error
    with_collar = DetectionErrorRate(collar=0.5)(ref, hyp)
    assert with_collar == pytest.approx(0.0, abs=1e-9)


def test_discrete_macro_f_empty_class_convention():
    from pyannote_audio_tpu.utils.metric import DiscreteMacroAverageFMeasure

    m = DiscreteMacroAverageFMeasure(classes=["a", "b"])
    ref = np.zeros((10, 2))
    hyp = np.zeros((10, 2))
    ref[:5, 0] = 1
    hyp[:5, 0] = 1
    # class b never occurs: precision=recall=1 convention -> macro F = 1
    assert m(ref, hyp) == pytest.approx(1.0)


def test_augmentation_registry_probability():
    from pyannote_audio_tpu.augmentation.registry import (
        apply_augmentations, register_augmentation,
        unregister_augmentation)

    calls = {"n": 0}

    def marker(X, y):
        calls["n"] += 1
        return X, y

    register_augmentation("p-test", marker, p=0.25)
    try:
        rng = np.random.default_rng(0)
        for _ in range(400):
            apply_augmentations(np.zeros(1), None, rng=rng)
    finally:
        unregister_augmentation("p-test")
    assert 60 <= calls["n"] <= 140      # ~100 expected at p=0.25


def test_der_sweep_matches_bruteforce_after_optimization():
    """The event-sweep DER must equal a per-interval brute-force on a
    randomized annotation pair (incl. overlapping same-label tracks)."""
    from pyannote_audio_tpu.metrics.der import (
        diarization_error_rate_components)

    rng = np.random.default_rng(7)
    for trial in range(5):
        def random_ann(k):
            ann = Annotation(uri="r")
            for t in range(12):
                start = float(rng.uniform(0, 30))
                dur = float(rng.uniform(0.5, 6.0))
                ann[Segment(start, start + dur), t] = \
                    f"s{int(rng.integers(k))}"
            return ann

        ref, hyp = random_ann(3), random_ann(3)
        comp = diarization_error_rate_components(ref, hyp)
        # brute force on a fine grid
        grid = np.arange(0.0, 40.0, 0.005)
        mids = grid + 0.0025
        from pyannote_audio_tpu.metrics.der import optimal_mapping
        mapping = optimal_mapping(ref, hyp)
        fa = miss = conf = total = 0.0
        for mid in mids:
            r = {lbl for seg, _, lbl in ref.itertracks(yield_label=True)
                 if seg.start <= mid < seg.end}
            h = {mapping.get(lbl) for seg, _, lbl
                 in hyp.itertracks(yield_label=True)
                 if seg.start <= mid < seg.end}
            nr, nh = len(r), len(h)
            nc = len(r & h)
            total += nr * 0.005
            miss += max(0, nr - nh) * 0.005
            fa += max(0, nh - nr) * 0.005
            conf += (min(nr, nh) - nc) * 0.005
        assert comp.total == pytest.approx(total, abs=0.15)
        assert comp.missed_detection == pytest.approx(miss, abs=0.15)
        assert comp.false_alarm == pytest.approx(fa, abs=0.15)
        assert comp.confusion == pytest.approx(conf, abs=0.15)
