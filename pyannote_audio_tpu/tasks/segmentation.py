"""Frame-level segmentation tasks: VAD, multilabel, speaker diarization.

Parity: /root/reference/src/pyannote/audio/tasks/segmentation/
{voice_activity_detection,multilabel,speaker_diarization}.py + the shared
chunk-sampling mixin (mixins.py). The permutation-invariant diarization loss
is the TPU-native K!-enumeration powerset NLL (ops/losses.py) instead of
the reference's per-sample host Hungarian (speaker_diarization.py:402-485).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Text, Tuple, Union

import jax.numpy as jnp
import numpy as np

from ..core.model import Problem, Resolution, Specifications
from ..core.segment import Segment
from ..core.task import Task, TrainingBatch
from ..ops.losses import binary_cross_entropy, powerset_pit_loss
from ..ops.powerset import Powerset
from ..utils.database import Protocol


class SegmentationTaskMixin(Task):
    """Shared chunk preparation for frame-level tasks."""

    #: name of the file key carrying per-frame loss weights (reference
    #: threads it through utils/loss.py:32 interpolation); None = unweighted
    weight: Optional[Text] = None

    def default_metric(self):
        """Macro-average AUROC (parity: reference
        tasks/segmentation/mixins.py:51-66: Binary/Multilabel/Multiclass
        AUROC by problem type — here the binned streaming AUROC, which
        handles all three through its multilabel reduction)."""
        from ..metrics.auroc import BinnedAUROC
        problem = self.specifications.problem
        if problem in (Problem.BINARY_CLASSIFICATION,
                       Problem.MULTI_LABEL_CLASSIFICATION,
                       Problem.MONO_LABEL_CLASSIFICATION):
            return BinnedAUROC()
        raise RuntimeError(
            f"The {problem} problem type hasn't been given a default "
            f"segmentation metric yet.")

    def chunk_weight(self, file: Dict, chunk: Segment
                     ) -> Optional[np.ndarray]:
        """(frames, 1) per-frame loss weight cropped from file[self.weight].

        The key may hold a SlidingWindowFeature (cropped to the chunk) or a
        plain array covering the whole file at the task frame rate.
        """
        if self.weight is None:
            return None
        values = file.get(self.weight)
        if values is None:
            return None
        from ..core.segment import SlidingWindowFeature
        if isinstance(values, SlidingWindowFeature):
            data = values.crop(chunk, fixed=chunk.duration)
        else:
            # plain array covering the WHOLE file: slice the chunk's
            # share by time ratio (returning the full array would give
            # every chunk the same misaligned whole-file weight curve).
            # FIXED slice length (pad at the file tail): rounding both
            # ends independently makes lengths differ by 1 between
            # chunks of one batch and np.stack in collate would raise.
            data = np.asarray(values, dtype=np.float32)
            total = file.get("duration")
            if total is None and "annotated" in file:
                total = file["annotated"].extent().end
            if total:
                n = data.shape[0]
                length = max(1, int(round(
                    self.duration / float(total) * n)))
                i0 = min(max(int(round(chunk.start / float(total) * n)),
                             0), max(n - 1, 0))
                data = data[i0:i0 + length]
                if data.shape[0] < length:
                    data = np.pad(data, [(0, length - data.shape[0])]
                                  + [(0, 0)] * (data.ndim - 1))
        data = np.nan_to_num(np.asarray(data, dtype=np.float32), nan=0.0)
        if data.ndim == 1:
            data = data[:, None]
        return data[:, :1]

    def loss_weight(self, batch, num_frames: int):
        """(B, num_frames, 1) loss weight, or None when unweighted.

        Combines the per-frame ``weight`` batch entry (linearly
        interpolated to the prediction resolution, torch F.interpolate
        align_corners=False semantics) with warm-up masking: frames inside
        the warm-up regions never contribute to the loss (parity:
        common_step, reference core/task.py:732-773).
        """
        left = round(self.warm_up[0] / self.duration * num_frames)
        right = round(self.warm_up[1] / self.duration * num_frames)
        w = batch.weight
        if w is None and left == 0 and right == 0:
            return None
        if w is None:
            w = jnp.ones((batch.X.shape[0], num_frames, 1), jnp.float32)
        else:
            from ..ops.losses import interpolate_weight
            # jnp (not np): w is a tracer inside the jitted train step
            w = interpolate_weight(
                jnp.asarray(w).astype(jnp.float32), num_frames)
        if left > 0:
            w = w.at[:, :left].set(0.0)
        if right > 0:
            w = w.at[:, num_frames - right:].set(0.0)
        return w

    def frame_targets(self, file: Dict, chunk: Segment,
                      labels: Sequence[Text]) -> np.ndarray:
        """Discretize file['annotation'] over the chunk at frame resolution."""
        if self.model is not None:
            num_samples = int(round(self.duration
                                    * self.audio.sample_rate))
            num_frames = self.model.num_frames(num_samples)
        else:
            num_frames = int(round(self.duration * 100))
        step = self.duration / num_frames
        data = np.zeros((num_frames, len(labels)), dtype=np.float32)
        cropped = file["annotation"].crop(chunk)
        for seg, _, label in cropped.itertracks(yield_label=True):
            if label not in labels:
                continue
            k = labels.index(label)
            i0 = int(round((seg.start - chunk.start) / step))
            i1 = int(round((seg.end - chunk.start) / step))
            data[max(i0, 0):min(i1, num_frames), k] = 1.0
        return data

    def crop_waveform(self, file: Dict, chunk: Segment) -> np.ndarray:
        waveform, _ = self.audio.crop(file, chunk, duration=self.duration,
                                      mode="pad")
        return waveform


class VoiceActivityDetection(SegmentationTaskMixin):
    """Binary speech/non-speech (parity: voice_activity_detection.py:35)."""

    def __init__(self, protocol: Protocol, duration: float = 2.0,
                 balance=None, weight: Optional[Text] = None, **kwargs):
        super().__init__(protocol, duration=duration, balance=balance,
                         **kwargs)
        self.weight = weight

    def setup(self, model=None) -> None:
        super().setup(model)
        self.specifications = Specifications(
            problem=Problem.BINARY_CLASSIFICATION,
            resolution=Resolution.FRAME,
            duration=self.duration,
            warm_up=self.warm_up,
            classes=["speech"],
        )

    def prepare_chunk(self, file: Dict, chunk: Segment, rng) -> Dict:
        X = self.crop_waveform(file, chunk)
        targets = self.frame_targets(file, chunk,
                                     file["annotation"].labels())
        if targets.shape[1] == 0:
            # speech-free file: a legitimate all-negative VAD example
            # (max over zero labels has no identity and would raise)
            speech = np.zeros((targets.shape[0], 1), targets.dtype)
        else:
            speech = targets.max(axis=1, keepdims=True)
        out = {"X": X, "y": speech}
        w = self.chunk_weight(file, chunk)
        if w is not None:
            out["weight"] = w
        return out

    def loss(self, model, params, batch):
        pred = model.apply_fn(params, jnp.asarray(batch.X))
        return binary_cross_entropy(pred, jnp.asarray(batch.y),
                                    weight=self.loss_weight(
                                        batch, pred.shape[1]))


class MultiLabelSegmentation(SegmentationTaskMixin):
    """Generic K-class frame classification (parity: multilabel.py:40)."""

    def __init__(self, protocol: Protocol, classes: Optional[List[Text]] = None,
                 duration: float = 2.0, weight: Optional[Text] = None,
                 **kwargs):
        super().__init__(protocol, duration=duration, **kwargs)
        self.classes = classes
        self.weight = weight

    def setup(self, model=None) -> None:
        super().setup(model)
        if self.classes is None:
            labels = set()
            for file in self._train_files:
                labels.update(file["annotation"].labels())
            self.classes = sorted(labels)
        self.specifications = Specifications(
            problem=Problem.MULTI_LABEL_CLASSIFICATION,
            resolution=Resolution.FRAME,
            duration=self.duration,
            warm_up=self.warm_up,
            classes=self.classes,
        )

    def prepare_chunk(self, file: Dict, chunk: Segment, rng) -> Dict:
        out = {"X": self.crop_waveform(file, chunk),
               "y": self.frame_targets(file, chunk, self.classes)}
        w = self.chunk_weight(file, chunk)
        if w is not None:
            out["weight"] = w
        return out

    def loss(self, model, params, batch):
        pred = model.apply_fn(params, jnp.asarray(batch.X))
        return binary_cross_entropy(pred, jnp.asarray(batch.y),
                                    weight=self.loss_weight(
                                        batch, pred.shape[1]))


class SpeakerDiarization(SegmentationTaskMixin):
    """Permutation-invariant powerset diarization.

    Parity: tasks/segmentation/speaker_diarization.py:58-677 —
    max_speakers_per_chunk estimated as the 97th percentile of per-window
    speaker counts (:167-244), targets keep the most talkative speakers
    (:356-400), loss = PIT powerset NLL.
    """

    def __init__(
        self,
        protocol: Protocol,
        duration: float = 10.0,
        max_speakers_per_chunk: Optional[int] = None,
        max_speakers_per_frame: Optional[int] = 2,
        weigh_by_cardinality: bool = False,
        weight: Optional[Text] = None,
        **kwargs,
    ):
        super().__init__(protocol, duration=duration, **kwargs)
        self.weight = weight
        self.max_speakers_per_chunk = max_speakers_per_chunk
        self.max_speakers_per_frame = max_speakers_per_frame
        self.weigh_by_cardinality = weigh_by_cardinality
        self._powerset: Optional[Powerset] = None

    def estimate_max_speakers_per_chunk(self) -> int:
        """97th percentile of speaker count over sliding windows."""
        counts = []
        for file in self._train_files:
            annotation = file["annotation"]
            extent = annotation.get_timeline().extent()
            if not extent:
                continue
            step = self.duration / 4
            t = extent.start
            while t + self.duration <= extent.end + step:
                window = Segment(t, t + self.duration)
                counts.append(len(annotation.crop(window).labels()))
                t += step
        if not counts:
            return 2
        return max(2, int(np.ceil(np.percentile(counts, 97))))

    def setup(self, model=None) -> None:
        super().setup(model)
        if self.max_speakers_per_chunk is None:
            self.max_speakers_per_chunk = \
                self.estimate_max_speakers_per_chunk()
        self.specifications = Specifications(
            problem=Problem.MONO_LABEL_CLASSIFICATION,
            resolution=Resolution.FRAME,
            duration=self.duration,
            warm_up=self.warm_up,
            classes=[f"speaker#{i + 1}"
                     for i in range(self.max_speakers_per_chunk)],
            powerset_max_classes=self.max_speakers_per_frame,
            permutation_invariant=True,
        )
        self._powerset = Powerset(self.max_speakers_per_chunk,
                                  self.max_speakers_per_frame)

    @property
    def powerset(self) -> Powerset:
        if self._powerset is None:
            raise RuntimeError("call task.setup() first")
        return self._powerset

    def default_metric(self) -> Dict:
        """DER and its components at threshold 0.5 (parity: reference
        tasks/segmentation/speaker_diarization.py:487-500)."""
        from ..metrics.streaming import (DetectionErrorRate,
                                         DiarizationErrorRate,
                                         DiarizationPrecision,
                                         DiarizationRecall,
                                         FalseAlarmRate,
                                         MissedDetectionRate,
                                         SpeakerConfusionRate)
        return {
            "DiarizationErrorRate": DiarizationErrorRate(0.5),
            "DiarizationErrorRate/Confusion": SpeakerConfusionRate(0.5),
            "DiarizationErrorRate/Miss": MissedDetectionRate(0.5),
            "DiarizationErrorRate/FalseAlarm": FalseAlarmRate(0.5),
            "DiarizationErrorRate/Precision": DiarizationPrecision(0.5),
            "DiarizationErrorRate/Recall": DiarizationRecall(0.5),
            "DiarizationErrorRate/DetectionErrorRate":
                DetectionErrorRate(0.5),
        }

    def prepare_chunk(self, file: Dict, chunk: Segment, rng
                      ) -> Optional[Dict]:
        X = self.crop_waveform(file, chunk)
        labels = file["annotation"].crop(chunk).labels()
        y = self.frame_targets(file, chunk, labels)  # (F, num_local)
        K = self.max_speakers_per_chunk
        if y.shape[1] > K:
            # drop over-crowded chunks (reference drops them from the loss,
            # speaker_diarization.py:425-433); keep most talkative K
            talkative = np.argsort(-y.sum(axis=0))[:K]
            y = y[:, talkative]
        if y.shape[1] < K:
            y = np.pad(y, ((0, 0), (0, K - y.shape[1])))
        out = {"X": X, "y": y}
        w = self.chunk_weight(file, chunk)
        if w is not None:
            out["weight"] = w
        return out

    def loss(self, model, params, batch):
        log_probs = model.apply_fn(params, jnp.asarray(batch.X))
        class_weight = jnp.maximum(self.powerset.cardinality, 1) \
            if self.weigh_by_cardinality else None
        loss, _ = powerset_pit_loss(log_probs, jnp.asarray(batch.y),
                                    self.powerset,
                                    weight=self.loss_weight(
                                        batch, log_probs.shape[1]),
                                    class_weight=class_weight)
        return loss


def evaluate(protocol, subset: str = "test", model=None,
             registry: Optional[str] = None, onset: float = 0.5,
             display: bool = True) -> float:
    """Evaluate a segmentation model with frame-level DER.

    Parity: the reference task module's typer ``evaluate`` helper
    (tasks/segmentation/speaker_diarization.py:639-677): sliding
    inference -> hysteresis binarization -> DiscreteDiarizationErrorRate
    accumulated over the subset, with a per-file report. Returns the
    aggregate DER.

    ``model`` may be a Model instance or a checkpoint path; ``protocol``
    a protocol instance or name (``registry`` = database.yml to load).
    """
    from ..core.inference import Inference
    from ..core.model import Model
    from ..utils.database import get_protocol, register_database
    from ..utils.metric import DiscreteDiarizationErrorRate
    from ..utils.signal import binarize_swf

    if registry:
        register_database(registry)
    if isinstance(protocol, str):
        protocol = get_protocol(protocol)
    if not isinstance(model, Model):
        model = Model.from_pretrained(model)
    inference = Inference(model)
    metric = DiscreteDiarizationErrorRate()
    rows = []
    for file in getattr(protocol, subset)():
        scores = inference(file)
        hyp = binarize_swf(scores, onset=onset)
        support = Segment(0.0, hyp.sliding_window[
            len(hyp.data) - 1].middle + 0.5 * hyp.sliding_window.step)
        ref = file["annotation"].discretize(
            support=support, resolution=hyp.sliding_window,
            duration=support.duration)
        n = min(len(ref.data), len(hyp.data))
        der = metric(ref.data[:n], hyp.data[:n])
        rows.append((file.get("uri", "?"), der))
    aggregate = metric.compute()
    if display:
        for uri, der in rows:
            print(f"{uri}: DER={100 * der:.2f}%")
        print(f"TOTAL DER = {100 * aggregate:.2f}%")
    return aggregate


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(
        description="Evaluate a segmentation model (frame-level DER)")
    parser.add_argument("protocol")
    parser.add_argument("model")
    parser.add_argument("--subset", default="test")
    parser.add_argument("--registry", default=None)
    parser.add_argument("--onset", type=float, default=0.5)
    args = parser.parse_args()
    evaluate(args.protocol, subset=args.subset, model=args.model,
             registry=args.registry, onset=args.onset)


# the reference's name for the shared segmentation-task base
# (tasks/segmentation/mixins.py:45)
SegmentationTask = SegmentationTaskMixin
