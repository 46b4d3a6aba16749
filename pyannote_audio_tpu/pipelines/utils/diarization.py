"""Shared diarization post-processing math.

Parity: /root/reference/src/pyannote/audio/pipelines/utils/diarization.py
(SpeakerDiarizationMixin): set_num_speakers :34-69, optimal_mapping
:104-146, speaker_count :149-185, to_annotation :187-218, to_diarization
:220-268.

The count-constrained binarization in ``to_diarization`` is vectorized
(rank-vs-count comparison) instead of the reference's per-frame python loop.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional, Tuple, Union

import numpy as np

from ...core.annotation import Annotation
from ...core.inference import Inference
from ...core.segment import SlidingWindow, SlidingWindowFeature
from ...metrics.der import DiarizationErrorRate
from ...utils.signal import Binarize


def set_num_speakers(num_speakers: Optional[int] = None,
                     min_speakers: Optional[int] = None,
                     max_speakers: Optional[int] = None):
    """Resolve speaker-count constraints."""
    min_speakers = num_speakers or min_speakers or 1
    max_speakers = num_speakers or max_speakers or np.inf
    if min_speakers > max_speakers:
        raise ValueError(
            f"min_speakers ({min_speakers:g}) must be <= max_speakers "
            f"({max_speakers:g})")
    if min_speakers == max_speakers:
        num_speakers = min_speakers
    return num_speakers, min_speakers, max_speakers


class SpeakerDiarizationMixin:
    """Methods common to speaker diarization pipelines."""

    @staticmethod
    def set_num_speakers(num_speakers: Optional[int] = None,
                         min_speakers: Optional[int] = None,
                         max_speakers: Optional[int] = None):
        return set_num_speakers(num_speakers=num_speakers,
                                min_speakers=min_speakers,
                                max_speakers=max_speakers)

    @staticmethod
    def optimal_mapping(
        reference: Union[Mapping, Annotation],
        hypothesis: Annotation,
        return_mapping: bool = False,
    ):
        """Rename hypothesis labels to best match the reference."""
        annotated = None
        if isinstance(reference, Mapping):
            annotated = reference.get("annotated")
            reference = reference["annotation"]
        mapping = DiarizationErrorRate().optimal_mapping(
            reference, hypothesis, uem=annotated)
        mapped = hypothesis.rename_labels(mapping=mapping)
        if return_mapping:
            return mapped, mapping
        return mapped

    @staticmethod
    def speaker_count(
        binarized_segmentations: SlidingWindowFeature,
        frames: SlidingWindow,
        warm_up: Tuple[float, float] = (0.1, 0.1),
    ) -> SlidingWindowFeature:
        """Frame-level instantaneous speaker count: trim -> sum -> aggregate
        -> round."""
        trimmed = Inference.trim(binarized_segmentations, warm_up=warm_up)
        summed = SlidingWindowFeature(
            np.sum(trimmed.data, axis=-1, keepdims=True),
            trimmed.sliding_window)
        count = Inference.aggregate(summed, frames, hamming=False,
                                    missing=0.0, skip_average=False)
        count.data = np.rint(count.data).astype(np.uint8)
        return count

    @staticmethod
    def to_annotation(
        discrete_diarization: SlidingWindowFeature,
        min_duration_on: float = 0.0,
        min_duration_off: float = 0.0,
    ) -> Annotation:
        binarize = Binarize(onset=0.5, offset=0.5,
                            min_duration_on=min_duration_on,
                            min_duration_off=min_duration_off)
        return binarize(discrete_diarization)

    @staticmethod
    def to_diarization(
        segmentations: SlidingWindowFeature,
        count: SlidingWindowFeature,
    ) -> SlidingWindowFeature:
        """Count-constrained discrete diarization from clustered scores."""
        activations = Inference.aggregate(
            segmentations, count.sliding_window, hamming=False, missing=0.0,
            skip_average=True)
        _, num_speakers = activations.data.shape
        max_count = int(np.max(count.data)) if len(count.data) else 0
        if num_speakers < max_count:
            activations.data = np.pad(
                activations.data,
                ((0, 0), (0, max_count - num_speakers)))

        extent = activations.extent & count.extent
        activations = activations.crop(extent, return_data=False)
        count = count.crop(extent, return_data=False)
        n = min(len(activations.data), len(count.data))
        act = activations.data[:n]
        cnt = count.data[:n].reshape(-1)

        # keep the cnt[t] highest-scoring speakers of each frame:
        # rank of each speaker (0 = loudest) < count  -> active.
        # stable sort: ties break by speaker index, deterministically and
        # identically to the on-device jnp.argsort in ops/diarize_fused.py
        # (the reference leaves tie order unspecified)
        order = np.argsort(-act, axis=-1, kind="stable")
        ranks = np.empty_like(order)
        np.put_along_axis(ranks, order,
                          np.broadcast_to(np.arange(act.shape[1]),
                                          act.shape).copy(), axis=-1)
        binary = (ranks < cnt[:, None]).astype(np.float32)
        return SlidingWindowFeature(binary, activations.sliding_window)
