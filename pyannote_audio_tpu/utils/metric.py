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
    """Window-wise DER over a sliding window (parity: metric.py:245)."""

    def __init__(self, window: float = 10.0):
        self.window = window

    def __call__(self, reference: SlidingWindowFeature,
                 hypothesis: SlidingWindowFeature) -> np.ndarray:
        step = reference.sliding_window.step
        frames_per_window = max(1, int(round(self.window / step)))
        n = min(len(reference.data), len(hypothesis.data))
        ders = []
        for start in range(0, n - frames_per_window + 1,
                           frames_per_window):
            stop = start + frames_per_window
            parts = discrete_diarization_error_rate(
                reference.data[start:stop], hypothesis.data[start:stop])
            ders.append(parts["diarization error rate"])
        return np.asarray(ders)


class MacroAverageFMeasure:
    """Per-class F-measure, macro-averaged (parity: metric.py:289)."""

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
        precision = self._tp / np.maximum(self._tp + self._fp, 1e-8)
        recall = self._tp / np.maximum(self._tp + self._fn, 1e-8)
        f = 2 * precision * recall / np.maximum(precision + recall, 1e-8)
        return float(np.mean(f))
