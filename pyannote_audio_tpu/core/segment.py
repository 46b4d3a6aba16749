"""Temporal primitives: Segment, SlidingWindow, SlidingWindowFeature.

TPU-native re-implementation of the data model the reference imports from the
external ``pyannote.core`` package (see SURVEY.md §1.7). These are host-side,
numpy-backed containers; everything heavy stays in JAX arrays elsewhere.

Reference parity: pyannote.core.Segment / SlidingWindow / SlidingWindowFeature
(used throughout /root/reference/src/pyannote/audio/core/inference.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple, Union

import numpy as np

# Two segments closer than this are considered identical / touching.
SEGMENT_PRECISION = 1e-6


@dataclass(frozen=True, order=True)
class Segment:
    """A time interval [start, end), in seconds."""

    start: float = 0.0
    end: float = 0.0

    @property
    def duration(self) -> float:
        return self.end - self.start if self.end > self.start else 0.0

    @property
    def middle(self) -> float:
        return 0.5 * (self.start + self.end)

    def __bool__(self) -> bool:
        """A segment is false-y when empty (duration below precision)."""
        return bool((self.end - self.start) > SEGMENT_PRECISION)

    def __contains__(self, other: "Segment") -> bool:
        return (self.start <= other.start) and (self.end >= other.end)

    def __and__(self, other: "Segment") -> "Segment":
        """Intersection (may be empty / false-y)."""
        return Segment(max(self.start, other.start), min(self.end, other.end))

    def __or__(self, other: "Segment") -> "Segment":
        """Union hull (smallest segment containing both)."""
        if not self:
            return other
        if not other:
            return self
        return Segment(min(self.start, other.start), max(self.end, other.end))

    def __xor__(self, other: "Segment") -> "Segment":
        """Gap between two segments."""
        if not self or not other:
            raise ValueError("empty segment has no gap")
        return Segment(min(self.end, other.end), max(self.start, other.start))

    def intersects(self, other: "Segment") -> bool:
        return (
            (self.start < other.start
             and other.start < self.end - SEGMENT_PRECISION)
            or (self.start > other.start
                and self.start < other.end - SEGMENT_PRECISION)
            or abs(self.start - other.start) < SEGMENT_PRECISION
        )

    def overlaps(self, t: float) -> bool:
        return self.start <= t <= self.end

    def __str__(self) -> str:
        return f"[{self.start:.3f} --> {self.end:.3f}]"

    def __repr__(self) -> str:
        return f"<Segment({self.start:g}, {self.end:g})>"


class SlidingWindow:
    """Fixed-duration window sliding with a fixed step.

    Frame ``i`` covers ``[start + i * step, start + i * step + duration)``.
    """

    def __init__(
        self,
        duration: float = 0.030,
        step: float = 0.010,
        start: float = 0.0,
        end: Optional[float] = None,
    ):
        if duration <= 0:
            raise ValueError("duration must be positive")
        if step <= 0:
            raise ValueError("step must be positive")
        self._duration = float(duration)
        self._step = float(step)
        self._start = float(start)
        self._end = float(end) if end is not None else np.inf

    duration = property(lambda self: self._duration)
    step = property(lambda self: self._step)
    start = property(lambda self: self._start)
    end = property(lambda self: self._end)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, SlidingWindow)
            and self._duration == other._duration
            and self._step == other._step
            and self._start == other._start
        )

    def closest_frame(self, t: float) -> int:
        """Index of the frame whose *center* is closest to time ``t``."""
        return int(np.rint((t - self._start - 0.5 * self._duration) / self._step))

    def samples(self, from_duration: float, mode: str = "strict") -> int:
        """Number of frames in a span of ``from_duration`` seconds."""
        if mode == "strict":
            return int(math.floor((from_duration - self._duration) / self._step)) + 1
        if mode == "loose":
            return int(math.floor((from_duration + self._duration) / self._step))
        if mode == "center":
            return int(np.rint(from_duration / self._step))
        raise ValueError(f"unknown mode {mode!r}")

    def crop(
        self,
        focus: Union[Segment, "SlidingWindow"],
        mode: str = "loose",
        fixed: Optional[float] = None,
        return_ranges: bool = False,
    ):
        """Frame indices overlapping the focus segment.

        mode='loose'  : frames with any overlap
        mode='strict' : frames fully contained in focus
        mode='center' : frames whose center is inside focus
        ``fixed``: force an exact number of frames (for round-off stability).
        """
        if isinstance(focus, SlidingWindow):
            focus = Segment(focus.start, focus.end)
        if mode == "loose":
            # frames with a strictly-positive overlap with focus
            i0 = int(np.ceil(
                (focus.start - self._duration - self._start) / self._step
                + SEGMENT_PRECISION))
            if fixed is None:
                j = int(np.floor((focus.end - self._start) / self._step
                                 - SEGMENT_PRECISION))
                n = j - i0 + 1
            else:
                n = int(np.floor(
                    (fixed + self._duration) / self._step))
        elif mode == "strict":
            i0 = int(np.ceil((focus.start - self._start) / self._step))
            if fixed is None:
                j = int(np.floor(
                    (focus.end - self._duration - self._start) / self._step))
                n = j - i0 + 1
            else:
                n = int(math.floor(
                    (fixed - self._duration) / self._step)) + 1
        elif mode == "center":
            # frames whose center lies in [focus.start, focus.end)
            i0 = int(np.ceil(
                (focus.start - self._start - 0.5 * self._duration)
                / self._step - SEGMENT_PRECISION))
            if fixed is None:
                j = int(np.floor(
                    (focus.end - self._start - 0.5 * self._duration)
                    / self._step - SEGMENT_PRECISION))
                n = j - i0 + 1
            else:
                n = int(np.rint(fixed / self._step))
        else:
            raise ValueError(f"unknown mode {mode!r}")
        end = i0 + max(n, 0)
        if return_ranges:
            return [[i0, end]]
        if fixed is None:
            # clamp START only (the end was computed from the unclamped
            # i0): lifting i0 after n was derived would SHIFT the range
            # past the focus instead of truncating it
            i0 = max(i0, 0)
            end = max(end, i0)
        # fixed crops keep the exact requested frame count, including
        # out-of-range indices — SlidingWindowFeature.crop pads them
        return np.arange(i0, end)

    def __getitem__(self, i: int) -> Segment:
        start = self._start + i * self._step
        return Segment(start, start + self._duration)

    def __call__(
        self, support: Union[Segment, float], align_last: bool = False
    ) -> Iterator[Segment]:
        """Iterate windows covering ``support`` (a Segment or a duration)."""
        if isinstance(support, (int, float)):
            support = Segment(0.0, float(support))
        start = support.start
        i = 0
        last = None
        while True:
            s = start + i * self._step
            if s + self._duration > support.end + SEGMENT_PRECISION:
                break
            last = Segment(s, s + self._duration)
            yield last
            i += 1
        if align_last:
            # clamp to the support start: a support shorter than the
            # window must yield ONE window anchored at the support start
            # (extending past its end), never one starting before it —
            # consumers rasterize frame offsets from window.start
            final_start = max(support.start,
                              support.end - self._duration)
            final = Segment(final_start, final_start + self._duration)
            if final and (last is None or final.start - last.start
                          > SEGMENT_PRECISION):
                yield final

    def __iter__(self) -> Iterator[Segment]:
        if not np.isfinite(self._end):
            raise ValueError("cannot iterate an unbounded SlidingWindow")
        yield from self(Segment(self._start, self._end))

    def __len__(self) -> int:
        if not np.isfinite(self._end):
            raise ValueError("unbounded SlidingWindow has no length")
        return max(0, self.samples(self._end - self._start, mode="strict"))

    def __repr__(self) -> str:
        return (f"<SlidingWindow duration={self._duration:g} "
                f"step={self._step:g} start={self._start:g}>")


class SlidingWindowFeature:
    """A (num_frames, ...) array whose first axis is a SlidingWindow.

    ``data[i]`` is the feature for frames ``window[i]``. Supports numpy-style
    indexing, iteration over (frame_segment, value), and labelled axes.
    """

    def __init__(
        self,
        data: np.ndarray,
        sliding_window: SlidingWindow,
        labels: Optional[List[str]] = None,
    ):
        self.data = np.asarray(data)
        self.sliding_window = sliding_window
        self.labels = labels

    @property
    def extent(self) -> Segment:
        return Segment(
            self.sliding_window[0].start,
            self.sliding_window[len(self.data) - 1].end,
        )

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, i):
        return self.data[i]

    def __iter__(self) -> Iterator[Tuple[Segment, np.ndarray]]:
        for i in range(len(self.data)):
            yield self.sliding_window[i], self.data[i]

    def align(self, to: "SlidingWindowFeature") -> "SlidingWindowFeature":
        """Linear-interpolate this feature onto another window grid."""
        my = self.sliding_window
        to_w = to.sliding_window
        n = len(to.data)
        centers = to_w.start + np.arange(n) * to_w.step + 0.5 * to_w.duration
        src = (centers - my.start - 0.5 * my.duration) / my.step
        src = np.clip(src, 0, len(self.data) - 1)
        lo = np.floor(src).astype(int)
        hi = np.minimum(lo + 1, len(self.data) - 1)
        frac = (src - lo).reshape((-1,) + (1,) * (self.data.ndim - 1))
        data = (1 - frac) * self.data[lo] + frac * self.data[hi]
        return SlidingWindowFeature(data, to_w, labels=self.labels)

    def crop(
        self,
        focus: Segment,
        mode: str = "loose",
        fixed: Optional[float] = None,
        return_data: bool = True,
    ):
        """Extract frames overlapping ``focus``.

        Fixed-size crops whose range extends past the data repeat the
        edge frames (pyannote.core parity — the reference training path
        relies on edge-repeated targets for chunks at file boundaries);
        an entirely out-of-range fixed crop zero-fills.
        """
        ranges = self.sliding_window.crop(
            focus, mode=mode, fixed=fixed, return_ranges=True)
        n = len(self.data)
        parts = []
        start_idx = None
        for (i0, i1) in ranges:
            if fixed is None:
                # no fixed size requested: clip to available data (a
                # focus entirely outside the extent yields an EMPTY
                # crop, never a wrap-around negative slice)
                i0 = min(max(i0, 0), n)
                i1 = min(max(i1, i0), n)
            if start_idx is None:
                start_idx = i0
            # requested length vs the part that overlaps [0, n): pads
            # derive from the REQUESTED range so fixed crops keep the
            # exact frame count even when fully out of range
            length = i1 - i0
            lo = min(max(i0, 0), n)
            hi = min(max(i1, lo), n)
            pad_before = min(length, max(0, -i0))
            pad_after = length - pad_before - (hi - lo)
            chunk = self.data[lo:hi]
            if pad_before > 0 or pad_after > 0:
                pad = [(pad_before, pad_after)] + [(0, 0)] * (
                    self.data.ndim - 1)
                if len(chunk):
                    chunk = np.pad(chunk, pad, mode="edge")
                else:
                    chunk = np.zeros(
                        (pad_before + pad_after,) + self.data.shape[1:],
                        dtype=self.data.dtype)
            parts.append(chunk)
        data = np.concatenate(parts, axis=0) if parts else self.data[:0]
        if return_data:
            return data
        window = SlidingWindow(
            duration=self.sliding_window.duration,
            step=self.sliding_window.step,
            start=self.sliding_window[start_idx].start,
        )
        return SlidingWindowFeature(data, window, labels=self.labels)

    def __repr__(self) -> str:
        return (f"<SlidingWindowFeature shape={self.data.shape} "
                f"window={self.sliding_window!r}>")


class DeviceSlidingWindowFeature(SlidingWindowFeature):
    """SlidingWindowFeature whose data lives on device (HBM).

    The diarization hot path keeps segmentation scores on device across
    counting / embedding masking / reconstruction (one host sync at most,
    and only if some consumer actually reads ``.data``). Host access stays
    transparent: the first ``.data`` read downloads and caches the array.

    ``device_data`` may be padded along the chunk axis (static-shape
    bucketing); ``num_valid`` is the real chunk count.
    """

    def __init__(self, device_data, sliding_window: SlidingWindow,
                 labels=None, num_valid: Optional[int] = None):
        self.device_data = device_data
        self.sliding_window = sliding_window
        self.labels = labels
        self.num_valid = (int(device_data.shape[0])
                          if num_valid is None else int(num_valid))
        self._host_data: Optional[np.ndarray] = None

    @property
    def data(self) -> np.ndarray:
        if self._host_data is None:
            self._host_data = np.asarray(
                self.device_data)[:self.num_valid]
        return self._host_data

    @data.setter
    def data(self, value) -> None:
        self._host_data = np.asarray(value)
        self.num_valid = len(self._host_data)
        # the device view is now stale: drop it so device consumers
        # (which read .device_data directly) fail loudly instead of
        # silently computing on the pre-mutation array
        self.device_data = None

    def __len__(self) -> int:
        return self.num_valid

    @property
    def extent(self) -> Segment:
        return Segment(
            self.sliding_window[0].start,
            self.sliding_window[self.num_valid - 1].end,
        )

    def __repr__(self) -> str:
        # device_data is None after a host .data assignment (deliberate
        # fail-loudly for device consumers) — repr must stay printable
        shape = (tuple(self.device_data.shape)
                 if self.device_data is not None
                 else tuple(self._host_data.shape) + ("host",))
        return (f"<DeviceSlidingWindowFeature "
                f"shape={shape} "
                f"valid={self.num_valid} "
                f"window={self.sliding_window!r}>")
