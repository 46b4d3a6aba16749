"""Streaming, distributed-reducible diarization metrics.

Parity: /root/reference/src/pyannote/audio/torchmetrics/ — the functional
DER decomposition (_der_update: speaker padding, optimal permutation,
threshold broadcast, fa/miss/conf split) and the Metric classes whose
states are sums reduced across ranks (dist_reduce_fx="sum").

TPU-native design: states are scalars accumulated on host or inside a
jitted eval step; inside pjit the update returns the four components so the
caller reduces them with jax.lax.psum over the data axis — the pjit
equivalent of torchmetrics' all-reduce.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.permutation import permutate_jax


def der_update(
    preds: jnp.ndarray,       # (batch, frames, speakers) scores in [0, 1]
    target: jnp.ndarray,      # (batch, frames, speakers) binary
    threshold: float = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batch of DER components (false_alarm, missed, confusion, total).

    Speakers are aligned with the optimal permutation (K! enumeration),
    then thresholded predictions are compared frame-wise.
    """
    k_pred = preds.shape[-1]
    k_tgt = target.shape[-1]
    k = max(k_pred, k_tgt)
    if k_pred < k:
        preds = jnp.pad(preds, ((0, 0), (0, 0), (0, k - k_pred)))
    if k_tgt < k:
        target = jnp.pad(target, ((0, 0), (0, 0), (0, k - k_tgt)))

    permuted, _ = permutate_jax(target, preds)
    hyp = (permuted > threshold).astype(jnp.float32)

    n_ref = jnp.sum(target, axis=-1)
    n_hyp = jnp.sum(hyp, axis=-1)
    n_correct = jnp.sum(target * hyp, axis=-1)

    missed = jnp.sum(jnp.maximum(n_ref - n_hyp, 0.0))
    false_alarm = jnp.sum(jnp.maximum(n_hyp - n_ref, 0.0))
    confusion = jnp.sum(jnp.minimum(n_ref, n_hyp) - n_correct)
    total = jnp.sum(n_ref)
    return false_alarm, missed, confusion, total


def der_compute(false_alarm, missed, confusion, total) -> jnp.ndarray:
    return (false_alarm + missed + confusion) / jnp.maximum(total, 1e-8)


def diarization_error_rate(preds, target, threshold: float = 0.5) -> float:
    """One-shot frame-level DER."""
    return float(der_compute(*der_update(jnp.asarray(preds),
                                         jnp.asarray(target),
                                         threshold=threshold)))


def optimal_diarization_error_rate(preds, target,
                                   thresholds: Optional[np.ndarray] = None
                                   ) -> Tuple[float, float]:
    """Minimum DER over a threshold sweep (reference sweeps 51 values)."""
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 51)
    ders = [diarization_error_rate(preds, target, threshold=t)
            for t in thresholds]
    best = int(np.argmin(ders))
    return ders[best], float(thresholds[best])


class _StreamingMetric:
    """Accumulating metric with psum-able scalar states."""

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.reset()

    def reset(self):
        self.false_alarm = 0.0
        self.missed_detection = 0.0
        self.speaker_confusion = 0.0
        self.speech_total = 0.0

    def update(self, preds, target):
        fa, miss, conf, total = der_update(
            jnp.asarray(preds), jnp.asarray(target),
            threshold=self.threshold)
        self.false_alarm += float(fa)
        self.missed_detection += float(miss)
        self.speaker_confusion += float(conf)
        self.speech_total += float(total)

    def merge_psum(self, components, axis_name: str):
        """In-pjit reduction helper: psum the component tuple."""
        return tuple(jax.lax.psum(c, axis_name) for c in components)

    def compute(self) -> float:
        raise NotImplementedError

    def __call__(self, preds, target) -> float:
        self.update(preds, target)
        return self.compute()


class DiarizationErrorRate(_StreamingMetric):
    def compute(self) -> float:
        return (self.false_alarm + self.missed_detection
                + self.speaker_confusion) / max(self.speech_total, 1e-8)


class FalseAlarmRate(_StreamingMetric):
    def compute(self) -> float:
        return self.false_alarm / max(self.speech_total, 1e-8)


class MissedDetectionRate(_StreamingMetric):
    def compute(self) -> float:
        return self.missed_detection / max(self.speech_total, 1e-8)


class SpeakerConfusionRate(_StreamingMetric):
    def compute(self) -> float:
        return self.speaker_confusion / max(self.speech_total, 1e-8)


class DetectionErrorRate(_StreamingMetric):
    def compute(self) -> float:
        return (self.false_alarm + self.missed_detection) / \
            max(self.speech_total, 1e-8)


class DiarizationPrecision(_StreamingMetric):
    def compute(self) -> float:
        detected = self.speech_total - self.missed_detection \
            + self.false_alarm
        correct = self.speech_total - self.missed_detection \
            - self.speaker_confusion
        return correct / max(detected, 1e-8)


class DiarizationRecall(_StreamingMetric):
    def compute(self) -> float:
        correct = self.speech_total - self.missed_detection \
            - self.speaker_confusion
        return correct / max(self.speech_total, 1e-8)


class OptimalDiarizationErrorRate(_StreamingMetric):
    """DER at the best global threshold (reference torchmetrics :274-411)."""

    def __init__(self, thresholds: Optional[np.ndarray] = None):
        self.thresholds = np.linspace(0.0, 1.0, 51) \
            if thresholds is None else np.asarray(thresholds)
        self.reset()

    def reset(self):
        n = len(self.thresholds)
        self.false_alarm = np.zeros(n)
        self.missed_detection = np.zeros(n)
        self.speaker_confusion = np.zeros(n)
        self.speech_total = 0.0

    def update(self, preds, target):
        total = None
        for i, threshold in enumerate(self.thresholds):
            fa, miss, conf, total = der_update(
                jnp.asarray(preds), jnp.asarray(target),
                threshold=float(threshold))
            self.false_alarm[i] += float(fa)
            self.missed_detection[i] += float(miss)
            self.speaker_confusion[i] += float(conf)
        if total is not None:        # total is threshold-independent
            self.speech_total += float(total)

    def compute(self) -> float:
        ders = (self.false_alarm + self.missed_detection
                + self.speaker_confusion) / max(self.speech_total, 1e-8)
        return float(np.min(ders))

    @property
    def optimal_threshold(self) -> float:
        ders = (self.false_alarm + self.missed_detection
                + self.speaker_confusion) / max(self.speech_total, 1e-8)
        return float(self.thresholds[int(np.argmin(ders))])


class EqualErrorRate:
    """Streaming EER over (score, binary-label) pairs.

    Parity: torchmetrics/classification/equal_error_rate.py (concatenated
    states, det-curve EER at compute time).
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.scores = []
        self.labels = []

    def update(self, scores, labels):
        self.scores.append(np.asarray(scores, dtype=float).reshape(-1))
        self.labels.append(np.asarray(labels, dtype=int).reshape(-1))

    def compute(self) -> float:
        if not self.scores:
            return float("nan")      # no trials accumulated
        scores = np.concatenate(self.scores)
        labels = np.concatenate(self.labels)
        order = np.argsort(-scores)
        labels = labels[order]
        pos = max(labels.sum(), 1)
        neg = max(len(labels) - labels.sum(), 1)
        tp = np.cumsum(labels)
        fp = np.cumsum(1 - labels)
        fnr = 1.0 - tp / pos        # miss rate as threshold decreases
        fpr = fp / neg              # false-positive rate
        i = int(np.argmin(np.abs(fnr - fpr)))
        return float(0.5 * (fnr[i] + fpr[i]))

    def __call__(self, scores, labels) -> float:
        self.update(scores, labels)
        return self.compute()
