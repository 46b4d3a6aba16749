"""Discrete (frame-level) diarization metrics on numpy arrays.

Parity: /root/reference/src/pyannote/audio/utils/metric.py
(discrete_diarization_error_rate :41, DiscreteDiarizationErrorRate :96,
SlidingDiarizationErrorRate :245, MacroAverageFMeasure :289).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..ops.permutation import permutate


def discrete_diarization_error_rate(
    reference: np.ndarray,     # (frames, speakers) binary
    hypothesis: np.ndarray,    # (frames, speakers) binary
    best_permutation: bool = True,
) -> Dict[str, float]:
    """Frame-level DER decomposition on already-aligned binary arrays."""
    reference = np.asarray(reference, dtype=float)
    hypothesis = np.asarray(hypothesis, dtype=float)
    n = min(len(reference), len(hypothesis))
    reference, hypothesis = reference[:n], hypothesis[:n]
    k = max(reference.shape[1], hypothesis.shape[1])
    if reference.shape[1] < k:
        reference = np.pad(reference,
                           ((0, 0), (0, k - reference.shape[1])))
    if hypothesis.shape[1] < k:
        hypothesis = np.pad(hypothesis,
                            ((0, 0), (0, k - hypothesis.shape[1])))
    if best_permutation:
        hypothesis, _ = permutate(reference, hypothesis)

    n_ref = reference.sum(axis=1)
    n_hyp = hypothesis.sum(axis=1)
    n_correct = (reference * hypothesis).sum(axis=1)
    missed = np.maximum(n_ref - n_hyp, 0.0).sum()
    false_alarm = np.maximum(n_hyp - n_ref, 0.0).sum()
    confusion = (np.minimum(n_ref, n_hyp) - n_correct).sum()
    total = n_ref.sum()
    return {
        "false alarm": float(false_alarm),
        "missed detection": float(missed),
        "confusion": float(confusion),
        "total": float(total),
        "diarization error rate":
            float((false_alarm + missed + confusion) / max(total, 1e-8)),
    }


class DiscreteDiarizationErrorRate:
    """Accumulating frame-level DER (parity: metric.py:96)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._components = {"false alarm": 0.0, "missed detection": 0.0,
                            "confusion": 0.0, "total": 0.0}

    def __call__(self, reference: np.ndarray, hypothesis: np.ndarray
                 ) -> float:
        parts = discrete_diarization_error_rate(reference, hypothesis)
        for key in self._components:
            self._components[key] += parts[key]
        return parts["diarization error rate"]

    def compute(self) -> float:
        c = self._components
        return (c["false alarm"] + c["missed detection"] + c["confusion"]) \
            / max(c["total"], 1e-8)

    def __abs__(self) -> float:
        return self.compute()


class SlidingDiarizationErrorRate:
    """Aggregated DER over 50%-overlapping windows (parity: reference
    utils/metric.py:245-286 — SlidingWindow(duration=window,
    step=window/2) over the evaluated extent, per-window DER components
    accumulated, ONE aggregate rate returned).

    The tail is covered by a final end-aligned window (pyannote.core's
    ``align_last`` behavior) so no frame is dropped. Per-window rates are
    kept on ``self.windowed_`` for inspection.
    """

    def __init__(self, window: float = 10.0):
        self.window = window
        self.windowed_: np.ndarray = np.asarray([])

    def __call__(self, reference: SlidingWindowFeature,
                 hypothesis: SlidingWindowFeature) -> float:
        step = reference.sliding_window.step
        frames_per_window = max(1, int(round(self.window / step)))
        hop = max(1, frames_per_window // 2)
        n = min(len(reference.data), len(hypothesis.data))
        components = {"false alarm": 0.0, "missed detection": 0.0,
                      "confusion": 0.0, "total": 0.0}
        starts = list(range(0, max(n - frames_per_window, 0) + 1, hop))
        if not starts:
            starts = [0]
        # end-aligned tail window when the full-window grid stops short
        if starts[-1] + frames_per_window < n:
            starts.append(max(n - frames_per_window, 0))
        ders = []
        for start in starts:
            stop = min(start + frames_per_window, n)
            parts = discrete_diarization_error_rate(
                reference.data[start:stop], hypothesis.data[start:stop])
            for key in components:
                components[key] += parts[key]
            ders.append(parts["diarization error rate"])
        self.windowed_ = np.asarray(ders)
        return float((components["false alarm"]
                      + components["missed detection"]
                      + components["confusion"])
                     / max(components["total"], 1e-8))


class MacroAverageFMeasure:
    """Per-class detection F-measure over Annotations, macro-averaged.

    THE canonical implementation (parity: reference utils/metric.py:289
    MacroAverageFMeasure, a pyannote.metrics BaseMetric over per-class
    sub-annotations) — the multilabel pipeline's ``get_metric`` re-exports
    this class. For frame-array inputs use
    :class:`DiscreteMacroAverageFMeasure`.
    """

    def __init__(self, classes):
        from ..metrics.der import DetectionPrecisionRecallFMeasure
        self._per_class = {c: DetectionPrecisionRecallFMeasure()
                           for c in classes}

    def __call__(self, reference, hypothesis, uem=None,
                 detailed: bool = False):
        values = {}
        for label, metric in self._per_class.items():
            values[label] = metric(reference.subset([label]),
                                   hypothesis.subset([label]), uem=uem)
        mean = sum(values.values()) / max(len(values), 1)
        return {"macro fscore": mean, **values} if detailed else mean

    def __abs__(self) -> float:
        vals = [abs(m) for m in self._per_class.values()]
        return sum(vals) / max(len(vals), 1)


class DiscreteMacroAverageFMeasure:
    """Per-class F-measure on binary FRAME arrays, macro-averaged."""

    def __init__(self, classes):
        self.classes = list(classes)
        self.reset()

    def reset(self):
        self._tp = np.zeros(len(self.classes))
        self._fp = np.zeros(len(self.classes))
        self._fn = np.zeros(len(self.classes))

    def __call__(self, reference: np.ndarray, hypothesis: np.ndarray
                 ) -> float:
        reference = np.asarray(reference) > 0.5
        hypothesis = np.asarray(hypothesis) > 0.5
        if reference.ndim != hypothesis.ndim or \
                reference.shape[1:] != hypothesis.shape[1:]:
            raise ValueError(
                f"class-count mismatch: reference {reference.shape} vs "
                f"hypothesis {hypothesis.shape} (broadcasting would "
                "silently credit every class with the same detections)")
        n = min(len(reference), len(hypothesis))
        reference, hypothesis = reference[:n], hypothesis[:n]
        self._tp += (reference & hypothesis).sum(axis=0)
        self._fp += (~reference & hypothesis).sum(axis=0)
        self._fn += (reference & ~hypothesis).sum(axis=0)
        return self.compute()

    def compute(self) -> float:
        # zero-support convention: a class absent from BOTH reference and
        # hypothesis scores precision=recall=1 (pyannote.metrics
        # f_measure; same convention as MacroAverageFMeasure above) —
        # F=0 would drag the macro mean down for classes that simply
        # never occur in the evaluated subset
        empty = (self._tp + self._fp + self._fn) == 0
        precision = np.where(
            empty, 1.0, self._tp / np.maximum(self._tp + self._fp, 1e-8))
        recall = np.where(
            empty, 1.0, self._tp / np.maximum(self._tp + self._fn, 1e-8))
        f = 2 * precision * recall / np.maximum(precision + recall, 1e-8)
        return float(np.mean(f))
