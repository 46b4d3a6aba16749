"""RTTM / UEM / LST file parsing and writing.

Replaces the corpus-file side of the reference's external dependency
``pyannote.database`` (SURVEY.md §1.7): NIST RTTM speaker records, UEM
evaluation maps, and plain-text URI lists.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, TextIO, Union

from ..core.annotation import Annotation, Timeline
from ..core.segment import Segment

PathLike = Union[str, Path]


def load_rttm(path: PathLike) -> Dict[str, Annotation]:
    """Parse an RTTM file into one Annotation per URI."""
    annotations: Dict[str, Annotation] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            fields = line.split()
            if fields[0] != "SPEAKER":
                continue
            uri = fields[1]
            start = float(fields[3])
            duration = float(fields[4])
            label = fields[7]
            ann = annotations.setdefault(uri, Annotation(uri=uri))
            seg = Segment(start, start + duration)
            ann[seg, ann.new_track(seg)] = label
    return annotations


def write_rttm(file: TextIO, *annotations: Annotation) -> None:
    for ann in annotations:
        ann.write_rttm(file)


def dump_rttm(annotations: Dict[str, Annotation], path: PathLike) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for uri in sorted(annotations):
            annotations[uri].write_rttm(f)


def load_uem(path: PathLike) -> Dict[str, Timeline]:
    """Parse a UEM file into one Timeline per URI."""
    timelines: Dict[str, Timeline] = {}
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith(";"):
                continue
            uri, _channel, start, end = line.split()[:4]
            tl = timelines.setdefault(uri, Timeline(uri=uri))
            tl.add(Segment(float(start), float(end)))
    return timelines


def dump_uem(timelines: Dict[str, Timeline], path: PathLike) -> None:
    with open(path, "w", encoding="utf-8") as f:
        for uri in sorted(timelines):
            for seg in timelines[uri]:
                f.write(f"{uri} 1 {seg.start:.3f} {seg.end:.3f}\n")


def load_lst(path: PathLike) -> List[str]:
    with open(path, "r", encoding="utf-8") as f:
        return [line.strip() for line in f if line.strip()]
