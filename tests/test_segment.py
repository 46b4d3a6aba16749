"""Segment / SlidingWindow / Timeline / Annotation unit tests."""

import numpy as np
import pytest

from pyannote_audio_tpu import (Annotation, Segment, SlidingWindow,
                                SlidingWindowFeature, Timeline)
from pyannote_audio_tpu.core.annotation import one_hot_decode


def test_segment_basics():
    s = Segment(1.0, 3.0)
    assert s.duration == 2.0
    assert s.middle == 2.0
    assert s
    assert not Segment(1.0, 1.0)
    assert (s & Segment(2.0, 4.0)) == Segment(2.0, 3.0)
    assert not (s & Segment(5.0, 6.0))
    assert (s | Segment(2.0, 4.0)) == Segment(1.0, 4.0)
    assert Segment(1.5, 2.5) in s


def test_sliding_window_frames():
    sw = SlidingWindow(duration=2.0, step=1.0)
    assert sw[0] == Segment(0.0, 2.0)
    assert sw[3] == Segment(3.0, 5.0)
    assert sw.closest_frame(1.0) == 0  # center of frame 0 is at 1.0
    assert sw.closest_frame(4.0) == 3
    assert sw.samples(10.0, mode="center") == 10


def test_sliding_window_iter():
    sw = SlidingWindow(duration=2.0, step=1.0)
    wins = list(sw(Segment(0, 5)))
    assert wins == [Segment(0, 2), Segment(1, 3), Segment(2, 4),
                    Segment(3, 5)]
    wins = list(sw(Segment(0, 4.5), align_last=True))
    assert wins[-1] == Segment(2.5, 4.5)


def test_timeline_support_and_gaps():
    tl = Timeline([Segment(0, 2), Segment(1, 3), Segment(5, 6)])
    sup = tl.support()
    assert list(sup) == [Segment(0, 3), Segment(5, 6)]
    assert sup.duration() == 4.0
    gaps = tl.gaps(support=Segment(0, 7))
    assert list(gaps) == [Segment(3, 5), Segment(6, 7)]


def test_timeline_crop():
    tl = Timeline([Segment(0, 2), Segment(3, 5)])
    cropped = tl.crop(Segment(1, 4))
    assert list(cropped) == [Segment(1, 2), Segment(3, 4)]


def test_annotation_tracks_and_labels():
    ann = Annotation(uri="test")
    ann[Segment(0, 2), "A"] = "alice"
    ann[Segment(1, 3), "B"] = "bob"
    ann[Segment(4, 5), "C"] = "alice"
    assert ann.labels() == ["alice", "bob"]
    assert ann.label_duration("alice") == 3.0
    chart = ann.chart()
    assert chart[0] == ("alice", 3.0)
    assert ann.argmax() == "alice"


def test_annotation_crop_and_support():
    ann = Annotation()
    ann[Segment(0, 2)] = "x"
    ann[Segment(2.05, 4)] = "x"
    merged = ann.support(collar=0.1)
    assert list(merged.itersegments()) == [Segment(0, 4)]
    cropped = ann.crop(Segment(1, 3))
    segs = list(cropped.itersegments())
    assert segs == [Segment(1, 2), Segment(2.05, 3)]


def test_annotation_rename():
    ann = Annotation()
    ann[Segment(0, 1)] = "spk1"
    ann[Segment(1, 2)] = "spk2"
    renamed = ann.rename_labels({"spk1": "SPEAKER_00", "spk2": "SPEAKER_01"})
    assert renamed.labels() == ["SPEAKER_00", "SPEAKER_01"]


def test_discretize_roundtrip():
    ann = Annotation(uri="x")
    ann[Segment(0.0, 1.0), 0] = "a"
    ann[Segment(2.0, 3.0), 1] = "b"
    feat = ann.discretize(support=Segment(0, 4), resolution=0.1)
    assert feat.data.shape == (40, 2)
    assert feat.data[:10, 0].all() and not feat.data[10:, 0].any()
    decoded = one_hot_decode(feat.data, feat.sliding_window,
                             labels=["a", "b"], uri="x")
    assert decoded.labels() == ["a", "b"]
    for (seg, _, lbl), (eseg, _, elbl) in zip(
            decoded.itertracks(yield_label=True),
            ann.itertracks(yield_label=True)):
        assert abs(seg.start - eseg.start) < 0.15
        assert abs(seg.end - eseg.end) < 0.15
        assert lbl == elbl


def test_swf_crop_and_align():
    sw = SlidingWindow(duration=0.1, step=0.1)
    data = np.arange(100, dtype=float).reshape(100, 1)
    feat = SlidingWindowFeature(data, sw)
    crop = feat.crop(Segment(1.0, 2.0), mode="center")
    assert crop.shape[0] == 10
    assert crop[0, 0] == 10.0


def test_sliding_window_crop_focus_before_start():
    """A focus starting before the window start truncates (never shifts)
    the index range: only genuinely overlapping frames are returned."""
    sw = SlidingWindow(start=0.0, duration=2.0, step=1.0)
    idx = sw.crop(Segment(-3.0, 1.0), mode="loose")
    assert list(idx) == [0]


def test_swf_fixed_crop_edge_repeats():
    """Fixed-size crops past the data repeat edge frames
    (pyannote.core parity), never inject NaN."""
    data = np.arange(5, dtype=np.float32)[:, None]
    swf = SlidingWindowFeature(
        data, SlidingWindow(start=0.0, duration=1.0, step=1.0))
    out = swf.crop(Segment(-2.0, 2.0), fixed=4.0)
    assert np.isfinite(out).all()
    assert out[0, 0] == data[0, 0]      # left edge repeated
    tail = swf.crop(Segment(3.0, 8.0), fixed=5.0)
    assert np.isfinite(tail).all()
    assert tail[-1, 0] == data[-1, 0]   # right edge repeated


def test_align_last_never_starts_before_support():
    """A support shorter than the window yields one window anchored at
    the support start (consumers rasterize offsets from window.start)."""
    sw = SlidingWindow(start=0.0, duration=5.0, step=2.0)
    chunks = list(sw(Segment(0.0, 3.0), align_last=True))
    assert len(chunks) == 1
    assert chunks[0].start == 0.0 and chunks[0].duration == 5.0


def test_timeline_crop_loose_dedupes_across_support():
    tl = Timeline([Segment(0, 10)])
    sup = Timeline([Segment(1, 2), Segment(5, 6)])
    out = tl.crop(sup, mode="loose")
    assert len(out) == 1


def test_rename_labels_beyond_26_and_chart_support_merged():
    ann = Annotation(uri="x")
    for i in range(30):
        ann[Segment(i, i + 1), i] = f"spk{i:02d}"
    renamed = ann.rename_labels()
    assert len(renamed.labels()) == 30  # modulo-26 would merge 4 pairs
    # chart: overlapping same-label tracks merged like label_duration
    ann2 = Annotation(uri="y")
    ann2[Segment(0, 10), 0] = "X"
    ann2[Segment(5, 15), 1] = "X"
    ann2[Segment(0, 12), 2] = "Y"
    chart = dict(ann2.chart())
    assert chart["X"] == 15.0
    assert chart["Y"] == 12.0
