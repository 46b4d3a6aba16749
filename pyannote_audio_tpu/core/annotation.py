"""Timeline and Annotation: who-spoke-when containers.

TPU-native re-implementation of pyannote.core's Annotation/Timeline data model
(external dependency of the reference, SURVEY.md §1.7). Host-side containers;
used at the very edge of the pipeline (frame→segment extraction, RTTM io,
metrics). All heavy math stays in JAX.
"""

from __future__ import annotations

import itertools
from collections import defaultdict
from typing import (Dict, Hashable, Iterator, List, Optional, Set, TextIO,
                    Tuple, Union)

import numpy as np

from .segment import SEGMENT_PRECISION, Segment, SlidingWindow, SlidingWindowFeature

Label = Hashable
TrackName = Union[str, int]


def string_generator() -> Iterator[str]:
    """A, B, …, Z, AA, AB, … (pyannote.core label generator parity)."""
    for size in itertools.count(1):
        for letters in itertools.product(
                [chr(ord("A") + i) for i in range(26)], repeat=size):
            yield "".join(letters)


class Timeline:
    """An ordered set of (possibly overlapping) segments."""

    def __init__(self, segments: Optional[List[Segment]] = None,
                 uri: Optional[str] = None):
        self.uri = uri
        # ordered SET semantics (pyannote.core parity): exact duplicates
        # collapse — e.g. a repeated UEM line must not double-count its
        # region in every sweep that iterates the uem
        self._segments: List[Segment] = sorted(
            set(s for s in (segments or []) if s))
        self._seen: Set[Segment] = set(self._segments)
        self._dirty = False

    def _sort(self):
        if self._dirty:
            self._segments.sort()
            self._dirty = False

    def add(self, segment: Segment) -> "Timeline":
        if segment and segment not in self._seen:
            self._segments.append(segment)
            self._seen.add(segment)
            self._dirty = True
        return self

    def __len__(self) -> int:
        return len(self._segments)

    def __bool__(self) -> bool:
        return len(self._segments) > 0

    def __iter__(self) -> Iterator[Segment]:
        self._sort()
        return iter(self._segments)

    def __getitem__(self, i: int) -> Segment:
        self._sort()
        return self._segments[i]

    def __eq__(self, other) -> bool:
        return isinstance(other, Timeline) and \
            list(self) == list(other)

    def __contains__(self, s: Segment) -> bool:
        self._sort()
        return s in self._segments

    def index(self, s: Segment) -> int:
        self._sort()
        return self._segments.index(s)

    @property
    def segments_list_(self) -> List[Segment]:
        self._sort()
        return list(self._segments)

    def extent(self) -> Segment:
        if not self._segments:
            return Segment(0.0, 0.0)
        self._sort()
        return Segment(
            min(s.start for s in self._segments),
            max(s.end for s in self._segments),
        )

    def duration(self) -> float:
        """Total duration of the support (overlaps counted once)."""
        return sum(s.duration for s in self.support())

    def support(self, collar: float = 0.0) -> "Timeline":
        """Merge overlapping (or within-collar) segments."""
        merged: List[Segment] = []
        for s in self:
            if merged and s.start <= merged[-1].end + collar:
                merged[-1] = Segment(merged[-1].start,
                                     max(merged[-1].end, s.end))
            else:
                merged.append(s)
        return Timeline(merged, uri=self.uri)

    def gaps(self, support: Optional[Union[Segment, "Timeline"]] = None
             ) -> "Timeline":
        if support is None:
            support = self.extent()
        if isinstance(support, Segment):
            support = Timeline([support], uri=self.uri)
        out = Timeline(uri=self.uri)
        for seg in support.support():
            t = seg.start
            for s in self.support().crop_timeline(seg):
                gap = Segment(t, s.start)
                if gap:
                    out.add(gap)
                t = max(t, s.end)
            gap = Segment(t, seg.end)
            if gap:
                out.add(gap)
        return out

    def crop_timeline(self, focus: Segment) -> "Timeline":
        """Intersect every segment with ``focus`` (drops empties)."""
        out = Timeline(uri=self.uri)
        for s in self:
            inter = s & focus
            if inter:
                out.add(inter)
        return out

    def crop(self, support: Union[Segment, "Timeline"],
             mode: str = "intersection") -> "Timeline":
        if isinstance(support, Segment):
            support = Timeline([support], uri=self.uri)
        support = support.support()
        out = Timeline(uri=self.uri)
        seen = set()                  # a segment overlapping several
        for seg in support:           # support segments is kept ONCE
            for s in self:            # (pyannote.core set semantics)
                inter = s & seg
                if not inter:
                    continue
                if mode == "intersection":
                    out.add(inter)
                elif mode == "strict":
                    if s in seg and s not in seen:
                        seen.add(s)
                        out.add(s)
                elif mode == "loose":
                    if s not in seen:
                        seen.add(s)
                        out.add(s)
                else:
                    raise ValueError(f"unknown mode {mode!r}")
        return out

    def overlapping(self, t: float) -> List[Segment]:
        return [s for s in self if s.overlaps(t)]

    def union(self, other: "Timeline") -> "Timeline":
        return Timeline(list(self) + list(other), uri=self.uri)

    def update(self, other: "Timeline") -> "Timeline":
        for s in other:
            self.add(s)
        return self

    def copy(self) -> "Timeline":
        return Timeline(list(self), uri=self.uri)

    def covers(self, other: "Timeline") -> bool:
        gaps = self.gaps(support=other.support())
        return len(gaps.crop(other)) == 0

    def co_iter(self, other: "Timeline"):
        """Iterate pairs of intersecting segments (pyannote.core parity)."""
        for s1 in self:
            for s2 in other:
                if s2.start >= s1.end:
                    break
                if (s1 & s2).duration > 0:
                    yield s1, s2

    def to_annotation(self, generator: str = "string") -> "Annotation":
        ann = Annotation(uri=self.uri)
        names = string_generator() if generator == "string" else None
        for i, s in enumerate(self):
            ann[s] = next(names) if names is not None else i
        return ann

    def __repr__(self) -> str:
        return f"<Timeline uri={self.uri} segments={len(self)}>"

    def __str__(self) -> str:
        return "[" + " ".join(str(s) for s in self) + "]"


class Annotation:
    """Speaker diarization container: (segment, track) -> label.

    Mirrors the behavior of pyannote.core.Annotation as exercised by the
    reference pipelines (itertracks, label_timeline, support, crop,
    rename_labels, discretize, argmax...).
    """

    def __init__(self, uri: Optional[str] = None,
                 modality: Optional[str] = None):
        self.uri = uri
        self.modality = modality
        # segment -> {track_name: label}
        self._tracks: Dict[Segment, Dict[TrackName, Label]] = {}

    # -- construction ------------------------------------------------------

    def __setitem__(self, key: Union[Segment, Tuple[Segment, TrackName]],
                    label: Label):
        if isinstance(key, Segment):
            segment, track = key, "_"
        else:
            segment, track = key
        if not segment:
            return
        self._tracks.setdefault(segment, {})[track] = label

    def __getitem__(self, key: Union[Segment, Tuple[Segment, TrackName]]
                    ) -> Label:
        if isinstance(key, Segment):
            key = (key, "_")
        return self._tracks[key[0]][key[1]]

    def __delitem__(self, key: Union[Segment, Tuple[Segment, TrackName]]):
        if isinstance(key, Segment):
            del self._tracks[key]
        else:
            seg, track = key
            del self._tracks[seg][track]
            if not self._tracks[seg]:
                del self._tracks[seg]

    def new_track(self, segment: Segment, prefix: str = "") -> TrackName:
        existing = set(self._tracks.get(segment, {}))
        i = 0
        while f"{prefix}{i}" in existing:
            i += 1
        return f"{prefix}{i}"

    # -- iteration ---------------------------------------------------------

    def itersegments(self) -> Iterator[Segment]:
        return iter(sorted(self._tracks))

    def itertracks(self, yield_label: bool = False):
        for segment in sorted(self._tracks):
            for track in sorted(self._tracks[segment], key=str):
                if yield_label:
                    yield segment, track, self._tracks[segment][track]
                else:
                    yield segment, track

    def __len__(self) -> int:
        return len(self._tracks)

    def __bool__(self) -> bool:
        return len(self._tracks) > 0

    def __eq__(self, other) -> bool:
        return isinstance(other, Annotation) and \
            list(self.itertracks(yield_label=True)) == \
            list(other.itertracks(yield_label=True))

    # -- labels ------------------------------------------------------------

    def labels(self) -> List[Label]:
        return sorted({lbl for tracks in self._tracks.values()
                       for lbl in tracks.values()}, key=str)

    def chart(self) -> List[Tuple[Label, float]]:
        """(label, duration) sorted by decreasing SUPPORT-merged duration
        (pyannote.core parity: overlapping same-label tracks count their
        merged extent once, agreeing with label_duration)."""
        return sorted(((lbl, self.label_duration(lbl))
                       for lbl in self.labels()),
                      key=lambda kv: kv[1], reverse=True)

    def argmax(self, support: Optional[Segment] = None) -> Optional[Label]:
        cropped = self if support is None else self.crop(support)
        chart = cropped.chart()
        return chart[0][0] if chart else None

    def label_timeline(self, label: Label, copy: bool = True) -> Timeline:
        segs = [seg for seg, _, lbl in self.itertracks(yield_label=True)
                if lbl == label]
        return Timeline(segs, uri=self.uri)

    def label_duration(self, label: Label) -> float:
        return self.label_timeline(label).duration()

    def empty(self) -> "Annotation":
        """Empty copy with the same uri/modality (pyannote.core parity)."""
        return Annotation(uri=self.uri, modality=self.modality)

    def co_iter(self, other: "Annotation"):
        """Iterate pairs of intersecting tracks
        ((segment, track), (other_segment, other_track)) — pyannote.core
        parity; the building block of pairwise metric components."""
        others = list(other.itertracks())   # sort once, not per track
        for seg, track in self.itertracks():
            for oseg, otrack in others:
                if oseg.start >= seg.end:
                    break
                if (seg & oseg).duration > 0:
                    yield (seg, track), (oseg, otrack)

    def get_overlap(self, labels: Optional[List[Label]] = None
                    ) -> Timeline:
        """Timeline of regions where two or more tracks overlap.

        Parity: pyannote.core ``Annotation.get_overlap`` — the input to
        overlapped-speech-detection training and exclusive-mode checks.
        With ``labels``, only tracks carrying one of those labels count.
        """
        tracks = [(seg, track) for seg, track, label in
                  self.itertracks(yield_label=True)
                  if labels is None or label in labels]
        segments = sorted(seg for seg, _ in tracks)
        overlaps = Timeline(uri=self.uri)
        for i, s1 in enumerate(segments):
            for s2 in segments[i + 1:]:
                if s2.start >= s1.end:
                    break              # sorted: nothing later overlaps s1
                inter = s1 & s2
                if inter and inter.duration > 0:
                    overlaps.add(inter)
        return overlaps.support()

    def get_timeline(self, copy: bool = True) -> Timeline:
        return Timeline(list(self._tracks), uri=self.uri)

    def get_tracks(self, segment: Segment) -> Set[TrackName]:
        return set(self._tracks.get(segment, {}))

    def get_labels(self, segment: Segment) -> Set[Label]:
        return set(self._tracks.get(segment, {}).values())

    def rename_labels(
        self,
        mapping: Optional[Dict[Label, Label]] = None,
        generator: Optional[Iterator[Label]] = None,
        copy: bool = True,
    ) -> "Annotation":
        if mapping is None:
            if generator is None:
                # A..Z, AA, AB, ... — never wraps onto existing labels
                # (a modulo-26 generator silently merges speakers past 26)
                generator = string_generator()
            mapping = {lbl: next(generator) for lbl in self.labels()}
        out = Annotation(uri=self.uri, modality=self.modality) if copy \
            else self
        new_tracks = {}
        for seg, tracks in self._tracks.items():
            new_tracks[seg] = {t: mapping.get(l, l)
                               for t, l in tracks.items()}
        out._tracks = new_tracks
        return out

    def rename_tracks(self, generator: str = "int") -> "Annotation":
        """New track names: "int" (0, 1, ...), "string" (A, B, ..., AA,
        ...), or an iterator of names (pyannote.core parity)."""
        if generator is None or generator == "int":
            names = iter(itertools.count())
        elif generator == "string":
            names = string_generator()
        else:
            names = iter(generator)
        out = Annotation(uri=self.uri, modality=self.modality)
        for seg, _, lbl in self.itertracks(yield_label=True):
            out[seg, next(names)] = lbl
        return out

    def relabel_tracks(self, generator=None) -> "Annotation":
        """New unique label per track. ``generator``: "string" (A, B, …,
        AA, …), "int", or an iterator of labels (pyannote.core parity)."""
        if generator is None or generator == "int":
            generator = iter(itertools.count())
        elif generator == "string":
            generator = string_generator()
        out = Annotation(uri=self.uri, modality=self.modality)
        for seg, track in self.itertracks():
            out[seg, track] = next(generator)
        return out

    def subset(self, labels: List[Label], invert: bool = False
               ) -> "Annotation":
        labels = set(labels)
        out = Annotation(uri=self.uri, modality=self.modality)
        for seg, track, lbl in self.itertracks(yield_label=True):
            if (lbl in labels) != invert:
                out[seg, track] = lbl
        return out

    # -- geometry ----------------------------------------------------------

    def crop(self, support: Union[Segment, Timeline],
             mode: str = "intersection") -> "Annotation":
        if isinstance(support, Segment):
            support = Timeline([support], uri=self.uri)
        support = support.support()
        out = Annotation(uri=self.uri, modality=self.modality)
        for seg, track, lbl in self.itertracks(yield_label=True):
            for sup in support:
                inter = seg & sup
                if not inter:
                    continue
                if mode == "intersection":
                    # distinct source tracks may crop to the same segment
                    # (e.g. (0,10) and (5,10), both track "_", cropped to
                    # (5,8)) — uniquify instead of silently overwriting
                    tr = track
                    if tr in out._tracks.get(inter, {}):
                        tr = out.new_track(inter)
                    out[inter, tr] = lbl
                elif mode == "strict":
                    if seg in sup:
                        out[seg, track] = lbl
                elif mode == "loose":
                    out[seg, track] = lbl
        return out

    def extrude(self, removed: Union[Segment, Timeline],
                mode: str = "intersection") -> "Annotation":
        if isinstance(removed, Segment):
            removed = Timeline([removed], uri=self.uri)
        extent = self.get_timeline().extent() | removed.extent()
        keep = removed.gaps(support=extent)
        inverted = {"strict": "loose", "loose": "strict"}.get(mode, mode)
        return self.crop(keep, mode=inverted)

    def support(self, collar: float = 0.0) -> "Annotation":
        """Merge same-label segments closer than ``collar``."""
        out = Annotation(uri=self.uri, modality=self.modality)
        for label in self.labels():
            timeline = self.label_timeline(label).support(collar)
            for seg in timeline:
                out[seg, out.new_track(seg)] = label
        return out

    def update(self, other: "Annotation", copy: bool = False) -> "Annotation":
        target = self.copy() if copy else self
        for seg, track, lbl in other.itertracks(yield_label=True):
            target[seg, track] = lbl
        return target

    def copy(self) -> "Annotation":
        out = Annotation(uri=self.uri, modality=self.modality)
        out._tracks = {seg: dict(tracks)
                       for seg, tracks in self._tracks.items()}
        return out

    def __mul__(self, other: "Annotation") -> np.ndarray:
        """Label co-occurrence duration matrix (self.labels x other.labels)."""
        my_labels = self.labels()
        other_labels = other.labels()
        mat = np.zeros((len(my_labels), len(other_labels)))
        for i, l1 in enumerate(my_labels):
            t1 = self.label_timeline(l1)
            for j, l2 in enumerate(other_labels):
                t2 = other.label_timeline(l2)
                for s1 in t1:
                    for s2 in t2:
                        mat[i, j] += (s1 & s2).duration
        return mat

    # -- discretization ----------------------------------------------------

    def discretize(
        self,
        support: Optional[Segment] = None,
        resolution: Union[float, SlidingWindow] = 0.01,
        labels: Optional[List[Label]] = None,
        duration: Optional[float] = None,
    ) -> SlidingWindowFeature:
        """Rasterize to a (num_frames, num_labels) binary array."""
        if support is None:
            support = self.get_timeline().extent()
        if isinstance(resolution, SlidingWindow):
            window = SlidingWindow(duration=resolution.duration,
                                   step=resolution.step,
                                   start=support.start)
        else:
            window = SlidingWindow(duration=resolution, step=resolution,
                                   start=support.start)
        if labels is None:
            labels = self.labels()
        total = duration if duration is not None else support.duration
        num_frames = window.samples(total, mode="center")
        data = np.zeros((num_frames, len(labels)), dtype=np.float32)
        idx = {lbl: k for k, lbl in enumerate(labels)}
        for seg, _, lbl in self.itertracks(yield_label=True):
            if lbl not in idx:
                continue
            inter = seg & support
            if not inter:
                continue
            i0 = int(np.rint((inter.start - support.start) / window.step))
            i1 = int(np.rint((inter.end - support.start) / window.step))
            data[max(i0, 0):min(i1, num_frames), idx[lbl]] = 1.0
        return SlidingWindowFeature(data, window, labels=list(labels))

    # -- serialization -----------------------------------------------------

    def write_rttm(self, file: TextIO):
        for seg, track, lbl in self.itertracks(yield_label=True):
            file.write(
                f"SPEAKER {self.uri or '<NA>'} 1 {seg.start:.3f} "
                f"{seg.duration:.3f} <NA> <NA> {lbl} <NA> <NA>\n")

    def to_rttm(self) -> str:
        import io
        buf = io.StringIO()
        self.write_rttm(buf)
        return buf.getvalue()

    def __repr__(self) -> str:
        return (f"<Annotation uri={self.uri} segments={len(self)} "
                f"labels={self.labels()}>")

    def __str__(self) -> str:
        return "\n".join(f"{s} {t} {l}"
                         for s, t, l in self.itertracks(yield_label=True))


def one_hot_decode(
    data: np.ndarray,
    window: SlidingWindow,
    labels: Optional[List[Label]] = None,
    uri: Optional[str] = None,
) -> Annotation:
    """Inverse of Annotation.discretize: binary frames -> Annotation.

    Consecutive active frames of each class become one segment.
    """
    data = np.asarray(data)
    num_frames, num_labels = data.shape
    if labels is None:
        labels = [f"class_{k}" for k in range(num_labels)]
    ann = Annotation(uri=uri)
    frame_step = window.step
    frame_dur = window.duration
    for k in range(num_labels):
        active = data[:, k] > 0.5
        padded = np.concatenate([[False], active, [False]])
        starts = np.nonzero(~padded[:-1] & padded[1:])[0]
        ends = np.nonzero(padded[:-1] & ~padded[1:])[0]
        for i0, i1 in zip(starts, ends):
            start = window.start + i0 * frame_step
            end = window.start + (i1 - 1) * frame_step + frame_dur
            ann[Segment(start, end), k] = labels[k]
    return ann
