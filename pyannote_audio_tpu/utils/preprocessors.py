"""Protocol file preprocessors.

Parity: /root/reference/src/pyannote/audio/utils/preprocessors.py
(LowerTemporalResolution :38, DeriveMetaLabels :69, Waveform/SampleRate
:133-144).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..core.annotation import Annotation
from ..core.io import Audio
from ..core.segment import Segment


class LowerTemporalResolution:
    """Quantize annotation boundaries to a coarser resolution."""

    def __init__(self, resolution: float = 0.1):
        self.resolution = resolution

    def __call__(self, file: Dict) -> Annotation:
        annotation: Annotation = file["annotation"]
        out = Annotation(uri=annotation.uri, modality=annotation.modality)
        for seg, track, label in annotation.itertracks(yield_label=True):
            start = self.resolution * np.floor(seg.start / self.resolution)
            end = self.resolution * np.ceil(seg.end / self.resolution)
            new_seg = Segment(start, end)
            if new_seg:
                out[new_seg, out.new_track(new_seg)] = label
        return out


class DeriveMetaLabels:
    """Map fine labels to meta classes (e.g. speakers -> gender)."""

    def __init__(self, classes: List[str], unions: Optional[Dict] = None,
                 intersections: Optional[Dict] = None,
                 mapping: Optional[Dict] = None):
        self.classes = classes
        self.unions = unions or {}
        self.intersections = intersections or {}
        self.mapping = mapping or {}

    def __call__(self, file: Dict) -> Annotation:
        annotation: Annotation = file["annotation"]
        out = Annotation(uri=annotation.uri)
        for seg, track, label in annotation.itertracks(yield_label=True):
            mapped = self.mapping.get(label, label)
            if mapped in self.classes:
                out[seg, out.new_track(seg)] = mapped
        for meta, members in self.unions.items():
            members = set(members)
            for seg, _, label in annotation.itertracks(yield_label=True):
                if label in members:
                    out[seg, out.new_track(seg)] = meta
        for meta, members in self.intersections.items():
            timelines = [annotation.label_timeline(m).support()
                         for m in members]
            if not timelines:
                continue
            inter = timelines[0]
            for tl in timelines[1:]:
                inter = inter.crop(tl)
            for seg in inter:
                out[seg, out.new_track(seg)] = meta
        return out


class Waveform:
    """Preload waveforms into memory (parity: preprocessors.py:133)."""

    def __init__(self, sample_rate: int = 16000):
        self.audio = Audio(sample_rate=sample_rate, mono="downmix")

    def __call__(self, file: Dict):
        waveform, _ = self.audio(file)
        return waveform


class SampleRate:
    def __init__(self, sample_rate: int = 16000):
        self.sample_rate = sample_rate

    def __call__(self, file: Dict) -> int:
        return self.sample_rate
