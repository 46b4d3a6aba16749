"""Oracle segmentation: simulate a perfect segmentation model.

Parity: /root/reference/src/pyannote/audio/pipelines/utils/oracle.py
(oracle_segmentation :31-105): discretize the reference annotation over each
sliding chunk at the model's frame resolution.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from ...core.annotation import Annotation
from ...core.segment import Segment, SlidingWindow, SlidingWindowFeature


def oracle_segmentation(
    file,
    window: SlidingWindow,
    frames: Union[SlidingWindow, float],
    num_speakers: Optional[int] = None,
) -> SlidingWindowFeature:
    """Simulate perfect segmentation from file["annotation"].

    Returns (num_chunks, num_frames, num_speakers) binary scores.
    """
    if "annotation" not in file:
        raise ValueError("file must provide an 'annotation' key")
    annotation: Annotation = file["annotation"]
    if "duration" in file and file["duration"]:
        duration = file["duration"]
    else:
        from ...core.io import Audio
        duration = Audio().get_duration(file)

    if not isinstance(frames, SlidingWindow):
        frames = SlidingWindow(duration=frames, step=frames)

    labels = annotation.labels()
    if num_speakers is None:
        num_speakers = len(labels)

    window_frames = frames.samples(window.duration, mode="center")
    segmentations = []
    for chunk in window(Segment(0.0, duration), align_last=True):
        chunk_ann = annotation.crop(chunk)
        data = np.zeros((window_frames, num_speakers), dtype=np.float32)
        for seg, _, label in chunk_ann.itertracks(yield_label=True):
            k = labels.index(label)
            if k >= num_speakers:
                continue
            i0 = int(np.rint((seg.start - chunk.start) / frames.step))
            i1 = int(np.rint((seg.end - chunk.start) / frames.step))
            data[max(i0, 0):min(i1, window_frames), k] = 1.0
        segmentations.append(data)
    return SlidingWindowFeature(
        np.stack(segmentations), window, labels=labels[:num_speakers])
