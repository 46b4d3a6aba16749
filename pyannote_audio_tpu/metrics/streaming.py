"""Streaming, distributed-reducible diarization metrics.

Parity: /root/reference/src/pyannote/audio/torchmetrics/ — the functional
DER decomposition (_der_update: speaker padding, optimal permutation,
threshold broadcast, fa/miss/conf split,
functional/audio/diarization_error_rate.py:33-162) and the Metric classes
whose states are sums reduced across ranks (dist_reduce_fx="sum").

TPU-native design: one jitted pass computes the components for ALL
thresholds at once (the threshold axis broadcasts through the comparison,
matching the reference's tensor-threshold path) — a 51-threshold optimal
sweep is ONE dispatch and ONE host sync per batch, not 51. Inside pjit the
same component function runs per shard and ``merge_psum`` reduces the
tuple over the data axis — the pjit equivalent of torchmetrics'
all-reduce (wired into the trainer's jitted eval step,
train/evaluate.py).

API contract follows torchmetrics: ``update`` accumulates, ``compute``
returns the running aggregate, and ``__call__`` (forward) accumulates but
returns the value for THIS batch only.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.permutation import permutate_jax


@jax.jit
def _der_components_prepermuted(permuted: jnp.ndarray,  # (B, F, K) aligned
                                target: jnp.ndarray,    # (B, F, K) binary
                                thresholds: jnp.ndarray  # (T,)
                                ) -> jnp.ndarray:
    """Components pass on ALREADY speaker-aligned soft predictions."""
    hyp = (permuted[..., None] > thresholds).astype(jnp.float32)
    # (B, F, K, T)
    n_ref = jnp.sum(target, axis=-1)                      # (B, F)
    n_hyp = jnp.sum(hyp, axis=2)                          # (B, F, T)
    n_correct = jnp.sum(target[..., None] * hyp, axis=2)  # (B, F, T)

    detection_error = n_hyp - n_ref[..., None]
    false_alarm = jnp.sum(jnp.maximum(detection_error, 0.0), axis=(0, 1))
    missed = jnp.sum(jnp.maximum(-detection_error, 0.0), axis=(0, 1))
    confusion = jnp.sum(
        jnp.minimum(n_ref[..., None], n_hyp) - n_correct, axis=(0, 1))
    total = jnp.sum(n_ref)
    return jnp.concatenate(
        [false_alarm, missed, confusion, total[None]])


def _pad_speakers(preds: jnp.ndarray, target: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    k_pred, k_tgt = preds.shape[-1], target.shape[-1]
    k = max(k_pred, k_tgt)
    if k_pred < k:
        preds = jnp.pad(preds, ((0, 0), (0, 0), (0, k - k_pred)))
    if k_tgt < k:
        target = jnp.pad(target, ((0, 0), (0, 0), (0, k - k_tgt)))
    return preds, target


@jax.jit
def _der_components_packed(preds: jnp.ndarray,     # (B, F, K) in [0, 1]
                           target: jnp.ndarray,    # (B, F, K) binary
                           thresholds: jnp.ndarray  # (T,)
                           ) -> jnp.ndarray:
    """Packed DER components [fa (T,), miss (T,), conf (T,), total].

    Speakers must already be padded to a common K. The permutation is
    found ONCE on the soft predictions (reference _der_update:89-93), then
    the threshold axis broadcasts through the binarization — all T
    thresholds cost one fused pass.
    """
    permuted, _ = permutate_jax(target, preds)
    return _der_components_prepermuted(permuted, target, thresholds)


def der_components(preds, target, thresholds) -> jnp.ndarray:
    """(3T+1,) packed components for a (T,) threshold vector.

    Jittable for K <= 6 speakers (in-jit K! permutation enumeration).
    For K > 6 — where K! blows up — the speaker alignment falls back to
    the host Hungarian solver (eager-mode only), matching the reference's
    per-item ``linear_sum_assignment`` path.
    """
    preds, target = _pad_speakers(jnp.asarray(preds, jnp.float32),
                                  jnp.asarray(target, jnp.float32))
    thresholds = jnp.asarray(thresholds, jnp.float32)
    if preds.shape[-1] > 6:
        from ..ops.permutation import permutate
        permuted, _ = permutate(np.asarray(target), np.asarray(preds))
        return _der_components_prepermuted(
            jnp.asarray(permuted, jnp.float32), target, thresholds)
    return _der_components_packed(preds, target, thresholds)


def unpack_der_components(packed, num_thresholds: int):
    """Split a packed vector into (fa, miss, conf, total)."""
    t = num_thresholds
    return packed[:t], packed[t:2 * t], packed[2 * t:3 * t], packed[3 * t]


def der_update(
    preds: jnp.ndarray,       # (batch, frames, speakers) scores in [0, 1]
    target: jnp.ndarray,      # (batch, frames, speakers) binary
    threshold: Union[float, np.ndarray, jnp.ndarray] = 0.5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One batch of DER components (false_alarm, missed, confusion, total).

    ``threshold`` may be a scalar (scalar components returned) or a (T,)
    vector (each component is (T,); ``total`` stays scalar) — reference
    _der_update's threshold broadcast. One device dispatch either way.
    """
    scalar = np.ndim(threshold) == 0
    thresholds = jnp.atleast_1d(jnp.asarray(threshold, jnp.float32))
    packed = der_components(preds, target, thresholds)
    fa, miss, conf, total = unpack_der_components(packed, len(thresholds))
    if scalar:
        return fa[0], miss[0], conf[0], total
    return fa, miss, conf, total


def der_compute(false_alarm, missed, confusion, total) -> jnp.ndarray:
    return (false_alarm + missed + confusion) / jnp.maximum(total, 1e-8)


def merge_psum(components, axis_name: str):
    """In-pjit reduction of a component tuple (or packed vector) over the
    named data axis — the torchmetrics dist_reduce_fx="sum" equivalent.
    Used by the trainer's sharded eval step (train/evaluate.py)."""
    if isinstance(components, (tuple, list)):
        return tuple(jax.lax.psum(c, axis_name) for c in components)
    return jax.lax.psum(components, axis_name)


def diarization_error_rate(preds, target, threshold: float = 0.5) -> float:
    """One-shot frame-level DER."""
    return float(der_compute(*der_update(jnp.asarray(preds),
                                         jnp.asarray(target),
                                         threshold=threshold)))


def optimal_diarization_error_rate(preds, target,
                                   thresholds: Optional[np.ndarray] = None
                                   ) -> Tuple[float, float]:
    """Minimum DER over a threshold sweep (reference sweeps 51 values) —
    one dispatch for the whole sweep."""
    if thresholds is None:
        thresholds = np.linspace(0.0, 1.0, 51)
    fa, miss, conf, total = der_update(jnp.asarray(preds),
                                       jnp.asarray(target),
                                       threshold=np.asarray(thresholds))
    ders = np.asarray(der_compute(fa, miss, conf, total))
    best = int(np.argmin(ders))
    return float(ders[best]), float(np.asarray(thresholds)[best])


class _StreamingMetric:
    """Accumulating metric with psum-able scalar states.

    torchmetrics contract: ``__call__`` = forward (accumulates AND
    returns this batch's value); ``compute`` returns the aggregate.
    """

    def __init__(self, threshold: float = 0.5):
        self.threshold = threshold
        self.reset()

    def reset(self):
        self.false_alarm = 0.0
        self.missed_detection = 0.0
        self.speaker_confusion = 0.0
        self.speech_total = 0.0

    def update(self, preds, target) -> Tuple[float, float, float, float]:
        """Accumulate one batch; returns the batch components."""
        packed = np.asarray(der_components(
            preds, target, np.asarray([self.threshold], np.float32)))
        fa, miss, conf, total = (float(packed[0]), float(packed[1]),
                                 float(packed[2]), float(packed[3]))
        self.false_alarm += fa
        self.missed_detection += miss
        self.speaker_confusion += conf
        self.speech_total += total
        return fa, miss, conf, total

    def merge_psum(self, components, axis_name: str):
        """In-pjit reduction helper: psum the component tuple."""
        return merge_psum(components, axis_name)

    def update_from_components(self, false_alarm, missed_detection,
                               speaker_confusion, speech_total) -> None:
        """Accumulate pre-computed components (e.g. psum-reduced inside a
        jitted eval step) without re-running the update math."""
        self.false_alarm += float(false_alarm)
        self.missed_detection += float(missed_detection)
        self.speaker_confusion += float(speaker_confusion)
        self.speech_total += float(speech_total)

    @staticmethod
    def _from_components(false_alarm, missed_detection, speaker_confusion,
                         speech_total) -> float:
        raise NotImplementedError

    def compute(self) -> float:
        return self._from_components(
            self.false_alarm, self.missed_detection,
            self.speaker_confusion, self.speech_total)

    def __call__(self, preds, target) -> float:
        """torchmetrics ``forward``: accumulate, return the BATCH value."""
        return self._from_components(*self.update(preds, target))


class DiarizationErrorRate(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        return (fa + miss + conf) / max(total, 1e-8)


class SegmentationErrorRate(DiarizationErrorRate):
    """Local DER on a sliding window of frames.

    Parity: SegmentationErrorRate (reference
    torchmetrics/audio/diarization_error_rate.py:103-163): each window
    becomes its own batch item, so speaker confusion is judged locally
    (the optimal mapping is per window, matching the reference's
    windowed update through the permutation-free DER components).
    ``window_size``/``step_size`` are frame counts; step defaults to
    half the window; incomplete tail windows are dropped (torch
    ``unfold`` semantics). preds/target follow this module's
    (batch, frames, speakers) layout — the reference is
    (batch, speakers, frames).

    Hour-scale inputs: windows are processed in bounded batches of
    ``windows_per_chunk`` (components accumulate across batches), so
    host materialization never exceeds windows_per_chunk × window_size
    frames regardless of input length — a 360k-frame SWF streams
    through in fixed memory instead of concatenating every window copy.
    """

    #: windows per device dispatch; bounds peak host/device memory to
    #: windows_per_chunk * window_size * speakers floats per batch item.
    windows_per_chunk = 256

    def __init__(self, window_size: int, step_size: Optional[int] = None,
                 threshold: float = 0.5):
        super().__init__(threshold=threshold)
        self.window_size = window_size
        self.step_size = step_size or window_size // 2

    def update(self, preds, target):
        preds = np.asarray(preds)
        target = np.asarray(target)
        num_frames = preds.shape[1]
        if num_frames <= self.window_size:
            return super().update(preds, target)
        starts = list(range(0, num_frames - self.window_size + 1,
                            self.step_size))
        win, chunk = self.window_size, self.windows_per_chunk
        totals = np.zeros(4, np.float64)
        for i in range(0, len(starts), chunk):
            sub = starts[i:i + chunk]
            p = np.concatenate([preds[:, s:s + win] for s in sub], axis=0)
            t = np.concatenate([target[:, s:s + win] for s in sub], axis=0)
            if len(sub) < chunk and i > 0:
                # Zero-pad the tail batch to the steady-state shape so the
                # jitted component pass compiles exactly once (zero rows
                # contribute zero fa/miss/conf/total).
                pad = (chunk - len(sub)) * preds.shape[0]
                p = np.concatenate(
                    [p, np.zeros((pad,) + p.shape[1:], p.dtype)], axis=0)
                t = np.concatenate(
                    [t, np.zeros((pad,) + t.shape[1:], t.dtype)], axis=0)
            totals += np.asarray(super().update(p, t), np.float64)
        return tuple(totals)


class FalseAlarmRate(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        return fa / max(total, 1e-8)


class MissedDetectionRate(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        return miss / max(total, 1e-8)


class SpeakerConfusionRate(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        return conf / max(total, 1e-8)


class DetectionErrorRate(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        return (fa + miss) / max(total, 1e-8)


class DiarizationPrecision(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        detected = total - miss + fa
        correct = total - miss - conf
        return correct / max(detected, 1e-8)


class DiarizationRecall(_StreamingMetric):
    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        correct = total - miss - conf
        return correct / max(total, 1e-8)


class OptimalDiarizationErrorRate(_StreamingMetric):
    """DER at the best global threshold (reference torchmetrics :274-411).

    The 51-threshold sweep broadcasts through ONE jitted der-components
    pass per batch (reference functional :96-162) — one dispatch and one
    host sync, with (51,)-shaped psum-able states.
    """

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
        packed = np.asarray(der_components(
            preds, target, self.thresholds.astype(np.float32)))
        fa, miss, conf, total = unpack_der_components(
            packed, len(self.thresholds))
        self.false_alarm += fa
        self.missed_detection += miss
        self.speaker_confusion += conf
        self.speech_total += float(total)
        return fa, miss, conf, float(total)

    def update_from_components(self, false_alarm, missed_detection,
                               speaker_confusion, speech_total) -> None:
        self.false_alarm += np.asarray(false_alarm)
        self.missed_detection += np.asarray(missed_detection)
        self.speaker_confusion += np.asarray(speaker_confusion)
        self.speech_total += float(speech_total)

    @staticmethod
    def _ders(fa, miss, conf, total) -> np.ndarray:
        """Per-threshold DER vector — the single source for the family's
        compute / optimal_threshold / component-at-optimum variants."""
        return (np.asarray(fa) + np.asarray(miss) + np.asarray(conf)) \
            / max(float(total), 1e-8)

    @classmethod
    def _from_components(cls, fa, miss, conf, total) -> float:
        return float(np.min(cls._ders(fa, miss, conf, total)))

    @property
    def optimal_threshold(self) -> float:
        return float(self.thresholds[self._optimal_index(
            self.false_alarm, self.missed_detection,
            self.speaker_confusion, self.speech_total)])

    @classmethod
    def _optimal_index(cls, fa, miss, conf, total) -> int:
        return int(np.argmin(cls._ders(fa, miss, conf, total)))


class OptimalDiarizationErrorRateThreshold(OptimalDiarizationErrorRate):
    """The DER-optimal threshold itself (reference torchmetrics :364)."""

    @staticmethod
    def _from_components(fa, miss, conf, total) -> float:
        raise NotImplementedError     # threshold needs self.thresholds

    def compute(self) -> float:
        return self.optimal_threshold

    def __call__(self, preds, target) -> float:
        fa, miss, conf, total = self.update(preds, target)
        return float(self.thresholds[
            self._optimal_index(fa, miss, conf, total)])


class _OptimalComponent(OptimalDiarizationErrorRate):
    """A DER component evaluated AT the DER-optimal threshold
    (reference torchmetrics :380-419)."""

    _component = "false_alarm"

    def _value(self, fa, miss, conf, total) -> float:
        i = self._optimal_index(fa, miss, conf, total)
        parts = {"false_alarm": fa, "missed_detection": miss,
                 "speaker_confusion": conf}
        return float(np.asarray(parts[self._component])[i]) \
            / max(float(total), 1e-8)

    def compute(self) -> float:
        return self._value(self.false_alarm, self.missed_detection,
                           self.speaker_confusion, self.speech_total)

    def __call__(self, preds, target) -> float:
        return self._value(*self.update(preds, target))


class OptimalFalseAlarmRate(_OptimalComponent):
    _component = "false_alarm"


class OptimalMissedDetectionRate(_OptimalComponent):
    _component = "missed_detection"


class OptimalSpeakerConfusionRate(_OptimalComponent):
    _component = "speaker_confusion"


def det_curve(scores: np.ndarray, labels: np.ndarray
              ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fpr, fnr, thresholds) with TIED scores grouped.

    pyannote.metrics det_curve semantics (the reference EqualErrorRate
    delegates to it): each distinct score is one operating point — every
    trial with that score flips together, so ties never create
    intermediate points that no real threshold can realize.
    """
    scores = np.asarray(scores, dtype=float).reshape(-1)
    labels = np.asarray(labels, dtype=int).reshape(-1)
    order = np.argsort(-scores, kind="stable")
    scores, labels = scores[order], labels[order]
    pos = max(int(labels.sum()), 1)
    neg = max(len(labels) - int(labels.sum()), 1)
    # operating points = last index of each group of equal scores
    distinct = np.ones(len(scores), dtype=bool)
    if len(scores) > 1:
        distinct[:-1] = np.diff(scores) != 0
    tp = np.cumsum(labels)[distinct]
    fp = np.cumsum(1 - labels)[distinct]
    fnr = 1.0 - tp / pos          # miss rate (non-increasing)
    fpr = fp / neg                # false-positive rate (non-decreasing)
    return fpr, fnr, scores[distinct]


class EqualErrorRate:
    """Streaming EER over (score, binary-label) pairs.

    Parity: torchmetrics/classification/equal_error_rate.py (concatenated
    states, det-curve EER at compute time). torchmetrics forward
    contract: ``__call__`` accumulates and returns the EER of THIS batch.
    """

    def __init__(self):
        self.reset()

    def reset(self):
        self.scores = []
        self.labels = []

    def update(self, scores, labels):
        self.scores.append(np.asarray(scores, dtype=float).reshape(-1))
        self.labels.append(np.asarray(labels, dtype=int).reshape(-1))

    @staticmethod
    def _eer(scores: np.ndarray, labels: np.ndarray) -> float:
        fpr, fnr, _ = det_curve(scores, labels)
        # fnr decreases / fpr increases along the grouped curve; the EER
        # sits where they cross — interpolate linearly between the two
        # bracketing operating points (det_curve convention)
        diff = fnr - fpr
        (above,) = np.nonzero(diff <= 0)
        if len(above) == 0:               # never crosses: degenerate sets
            i = int(np.argmin(np.abs(diff)))
            return float(0.5 * (fnr[i] + fpr[i]))
        i = int(above[0])
        if i == 0 or diff[i] == 0:
            return float(0.5 * (fnr[i] + fpr[i]))
        # linear interpolation across the sign change of (fnr - fpr)
        w = diff[i - 1] / (diff[i - 1] - diff[i])
        fnr_x = fnr[i - 1] + w * (fnr[i] - fnr[i - 1])
        fpr_x = fpr[i - 1] + w * (fpr[i] - fpr[i - 1])
        return float(0.5 * (fnr_x + fpr_x))

    def compute(self) -> float:
        if not self.scores:
            return float("nan")      # no trials accumulated
        return self._eer(np.concatenate(self.scores),
                         np.concatenate(self.labels))

    def __call__(self, scores, labels) -> float:
        self.update(scores, labels)
        return self._eer(np.asarray(scores, dtype=float).reshape(-1),
                         np.asarray(labels, dtype=int).reshape(-1))
