"""Extra coverage: Annotation/Timeline geometry operations."""

import numpy as np
import pytest

from pyannote_audio_tpu import Annotation, Segment, Timeline


def test_annotation_extrude():
    ann = Annotation(uri="x")
    ann[Segment(0, 10)] = "A"
    out = ann.extrude(Segment(4, 6))
    segs = list(out.itersegments())
    assert segs == [Segment(0, 4), Segment(6, 10)]


def test_annotation_update_and_copy():
    a = Annotation(uri="x")
    a[Segment(0, 1)] = "A"
    b = Annotation(uri="x")
    b[Segment(2, 3)] = "B"
    c = a.update(b, copy=True)
    assert len(c) == 2 and len(a) == 1
    a.update(b)
    assert len(a) == 2


def test_annotation_cooccurrence():
    a = Annotation()
    a[Segment(0, 10)] = "A"
    b = Annotation()
    b[Segment(5, 15)] = "X"
    mat = a * b
    assert mat.shape == (1, 1)
    assert mat[0, 0] == pytest.approx(5.0)


def test_annotation_subset_invert():
    ann = Annotation()
    ann[Segment(0, 1)] = "A"
    ann[Segment(1, 2)] = "B"
    assert ann.subset(["A"]).labels() == ["A"]
    assert ann.subset(["A"], invert=True).labels() == ["B"]


def test_annotation_get_tracks_labels():
    ann = Annotation()
    seg = Segment(0, 1)
    ann[seg, "t1"] = "A"
    ann[seg, "t2"] = "B"
    assert ann.get_tracks(seg) == {"t1", "t2"}
    assert ann.get_labels(seg) == {"A", "B"}
    del ann[seg, "t1"]
    assert ann.get_labels(seg) == {"B"}


def test_timeline_covers_and_union():
    a = Timeline([Segment(0, 5), Segment(6, 10)])
    b = Timeline([Segment(1, 2), Segment(7, 8)])
    assert a.covers(b)
    assert not b.covers(a)
    u = a.union(b)
    assert len(u) == 4
    assert u.support().duration() == pytest.approx(9.0)


def test_timeline_to_annotation():
    tl = Timeline([Segment(0, 1), Segment(2, 3)])
    ann = tl.to_annotation()
    assert len(ann.labels()) == 2


def test_sliding_window_crop_modes():
    from pyannote_audio_tpu.core.segment import SlidingWindow
    sw = SlidingWindow(duration=1.0, step=0.5)
    loose = sw.crop(Segment(1.0, 2.0), mode="loose")
    strict = sw.crop(Segment(1.0, 2.0), mode="strict")
    # strict indices are a subset of loose
    assert set(strict).issubset(set(loose))
    fixed = sw.crop(Segment(1.0, 3.0), mode="loose", fixed=2.0)
    assert len(fixed) == sw.crop(Segment(5.0, 7.0), mode="loose",
                                 fixed=2.0).shape[0]


def test_rttm_roundtrip(tmp_path):
    from pyannote_audio_tpu.utils.rttm import dump_rttm, load_rttm
    ann = Annotation(uri="f1")
    ann[Segment(0.5, 2.25)] = "alice"
    ann[Segment(3.0, 4.5)] = "bob"
    dump_rttm({"f1": ann}, tmp_path / "x.rttm")
    loaded = load_rttm(tmp_path / "x.rttm")["f1"]
    assert loaded.labels() == ["alice", "bob"]
    for (s1, _, l1), (s2, _, l2) in zip(
            loaded.itertracks(yield_label=True),
            ann.itertracks(yield_label=True)):
        assert abs(s1.start - s2.start) < 1e-3
        assert abs(s1.duration - s2.duration) < 1e-3


def test_crop_intersection_preserves_colliding_tracks():
    """Two tracks cropping to the same (segment, track) key must both
    survive (regression: the second silently overwrote the first)."""
    ann = Annotation(uri="u")
    ann[Segment(0, 10)] = "speech"
    ann[Segment(5, 10)] = "music"
    cropped = ann.crop(Segment(5, 8))
    assert sorted(cropped.labels()) == ["music", "speech"]
    assert len(list(cropped.itertracks())) == 2


def test_annotation_track_and_chart_api():
    """rename_tracks / relabel_tracks / chart / argmax / union parity."""
    ann = Annotation(uri="u")
    ann[Segment(0, 4), "t1"] = "A"
    ann[Segment(2, 8), "t2"] = "B"
    ann[Segment(8, 9), "t3"] = "A"

    # chart: labels sorted by decreasing duration
    assert ann.chart() == [("B", 6.0), ("A", 5.0)]
    assert ann.argmax() == "B"

    renamed = ann.rename_tracks(generator="int")
    labels_before = sorted(ann.labels())
    assert sorted(renamed.labels()) == labels_before
    assert all(isinstance(t, int)
               for _, t in renamed.itertracks())

    relabeled = ann.relabel_tracks(generator="string")
    # every track gets its own label -> 3 distinct labels
    assert len(relabeled.labels()) == 3

    # timeline union/covers
    t1 = ann.label_timeline("A")
    t2 = ann.label_timeline("B")
    u = t1.union(t2)
    assert u.extent() == Segment(0, 9)


def test_timeline_gaps_and_covers():
    tl = Timeline([Segment(0, 2), Segment(5, 7)], uri="u")
    gaps = tl.gaps(support=Segment(0, 10))
    assert list(gaps) == [Segment(2, 5), Segment(7, 10)]
    assert tl.covers(Timeline([Segment(0.5, 1.5)]))
    assert not tl.covers(Timeline([Segment(3, 4)]))


def test_get_overlap():
    """Annotation.get_overlap parity: union of pairwise intersections of
    (optionally label-filtered) tracks, as a support()ed Timeline."""
    from pyannote_audio_tpu import Annotation, Segment, Timeline
    ann = Annotation(uri="x")
    ann[Segment(0, 10), 0] = "alice"
    ann[Segment(8, 15), 1] = "bob"
    ann[Segment(14, 20), 2] = "carol"
    ann[Segment(25, 30), 3] = "alice"
    overlap = ann.get_overlap()
    assert list(overlap) == [Segment(8, 10), Segment(14, 15)]

    # label filter: only alice+bob tracks count
    only_ab = ann.get_overlap(labels=["alice", "bob"])
    assert list(only_ab) == [Segment(8, 10)]

    # no overlap -> empty timeline
    lone = Annotation(uri="y")
    lone[Segment(0, 5), 0] = "a"
    assert len(lone.get_overlap()) == 0

    # overlapped-speech-detection derivation (tutorial 14)
    derived = overlap.to_annotation()
    derived = derived.rename_labels(
        {label: "overlap" for label in derived.labels()})
    assert derived.labels() == ["overlap"]


def test_empty_and_co_iter():
    from pyannote_audio_tpu import Annotation, Segment, Timeline
    ann = Annotation(uri="u", modality="speaker")
    ann[Segment(0, 5), 0] = "a"
    e = ann.empty()
    assert e.uri == "u" and e.modality == "speaker" and not e

    t1 = Timeline([Segment(0, 4), Segment(10, 12)])
    t2 = Timeline([Segment(3, 6), Segment(11, 15), Segment(20, 21)])
    pairs = list(t1.co_iter(t2))
    assert pairs == [(Segment(0, 4), Segment(3, 6)),
                     (Segment(10, 12), Segment(11, 15))]

    ref = Annotation(uri="u")
    ref[Segment(0, 4), 0] = "a"
    hyp = Annotation(uri="u")
    hyp[Segment(3, 6), 0] = "x"
    hyp[Segment(7, 9), 0] = "y"
    got = list(ref.co_iter(hyp))
    assert got == [((Segment(0, 4), 0), (Segment(3, 6), 0))]
