"""Speaker-embedding training: class-balanced sampling + ArcFace loss.

Parity: /root/reference/src/pyannote/audio/tasks/embedding/{mixins,arcface}
.py: batches of num_classes_per_batch x num_chunks_per_class chunks sampled
from per-speaker speech turns (mixins.py:43-205), ArcFace margin loss
(margin=28.6 deg, scale=64 — arcface.py:114-123, via
pytorch_metric_learning in the reference; implemented natively here), and
verification-trial validation (cosine -> EER, mixins.py:246-302).
"""

from __future__ import annotations

import math
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import Problem, Resolution, Specifications
from ..core.segment import Segment
from ..core.task import Task, TrainingBatch, create_rng_for_worker
from ..utils.database import Protocol


def arcface_loss(
    embeddings: jnp.ndarray,   # (batch, dim)
    labels: jnp.ndarray,       # (batch,) int
    weights: jnp.ndarray,      # (num_classes, dim) class prototypes
    margin_deg: float = 28.6,
    scale: float = 64.0,
) -> jnp.ndarray:
    """Additive angular margin softmax (ArcFace, Deng et al. 2019)."""
    margin = margin_deg * math.pi / 180.0
    e = embeddings / (jnp.linalg.norm(embeddings, axis=-1,
                                      keepdims=True) + 1e-8)
    w = weights / (jnp.linalg.norm(weights, axis=-1, keepdims=True) + 1e-8)
    cos = jnp.clip(e @ w.T, -1.0 + 1e-7, 1.0 - 1e-7)     # (B, C)
    theta = jnp.arccos(cos)
    target_mask = jax.nn.one_hot(labels, w.shape[0])
    logits = scale * jnp.where(target_mask > 0,
                               jnp.cos(theta + margin), cos)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(target_mask * log_probs, axis=-1))


class SupervisedRepresentationLearningWithArcFace(Task):
    """ArcFace speaker-embedding task."""

    def __init__(
        self,
        protocol: Protocol,
        min_duration: float = 2.0,
        duration: float = 5.0,
        num_classes_per_batch: int = 8,
        num_chunks_per_class: int = 4,
        margin: float = 28.6,
        scale: float = 64.0,
        **kwargs,
    ):
        kwargs.setdefault("batch_size",
                          num_classes_per_batch * num_chunks_per_class)
        super().__init__(protocol, duration=duration,
                         min_duration=min_duration, **kwargs)
        self.num_classes_per_batch = num_classes_per_batch
        self.num_chunks_per_class = num_chunks_per_class
        self.margin = margin
        self.scale = scale
        self._speech_turns: Dict[str, List[Tuple[Dict, Segment]]] = {}
        self._class_weights = None

    def setup(self, model=None) -> None:
        self.prepare_data()
        self.model = model
        # index speech turns per speaker (mixins.py:78-120)
        self._speech_turns = {}
        for file in self._train_files:
            for seg, _, label in file["annotation"].itertracks(
                    yield_label=True):
                if seg.duration < self.min_duration:
                    continue
                self._speech_turns.setdefault(str(label), []).append(
                    (file, seg))
        self.classes = sorted(self._speech_turns)
        self.specifications = Specifications(
            problem=Problem.REPRESENTATION,
            resolution=Resolution.CHUNK,
            duration=self.duration,
            min_duration=self.min_duration,
            classes=self.classes,
        )

    def init_loss_state(self, rng_key, dim: int):
        """Class-prototype matrix trained jointly with the model."""
        return jax.random.normal(
            rng_key, (len(self.classes), dim)) * 0.01

    def augment_params(self, params, rng_key, model):
        return {**params,
                "arcface": self.init_loss_state(rng_key, model.dimension)}

    def train_batches(self, epoch: int = 0, worker_id: int = 0,
                      rank: int = 0) -> Iterator[TrainingBatch]:
        rng = create_rng_for_worker(self.seed, epoch=epoch,
                                    worker_id=worker_id, rank=rank)
        classes = self.classes
        num_batches = max(1, self.train__len__() // self.batch_size)
        for _ in range(num_batches):
            # per-batch random duration in [min_duration, duration]
            # (mixins.py:130-205), QUANTIZED to a 0.25 s grid: jit keys
            # on shape, so a continuous draw would recompile the train
            # step on virtually every batch (seconds-to-minutes per
            # remote compile on this backend)
            duration = rng.uniform(self.min_duration, self.duration)
            duration = min(self.duration, max(
                self.min_duration, round(duration / 0.25) * 0.25))
            num_samples = int(round(duration * self.audio.sample_rate))
            chosen = rng.choice(len(classes),
                                size=min(self.num_classes_per_batch,
                                         len(classes)), replace=False)
            X, y = [], []
            for ci in chosen:
                turns = self._speech_turns[classes[ci]]
                # turns picked with probability proportional to duration
                # (mixins.py:169-175), fresh draw per chunk
                durations = np.array([seg.duration for _, seg in turns])
                p = durations / durations.sum()
                for _ in range(self.num_chunks_per_class):
                    file, seg = turns[rng.choice(len(turns), p=p)]
                    if seg.duration < duration:
                        # short turn: crop ONLY the turn and zero-pad at
                        # a random offset (mixins.py:178-186) — extending
                        # the chunk past the turn would label neighboring
                        # speakers' audio as this class
                        waveform, _ = self.audio.crop(file, seg)
                        missing = num_samples - waveform.shape[1]
                        if missing > 0:
                            left = int(rng.integers(0, missing + 1))
                            waveform = np.pad(
                                waveform, ((0, 0), (left, missing - left)))
                    else:
                        start = seg.start + rng.uniform() * \
                            (seg.duration - duration)
                        chunk = Segment(start, start + duration)
                        waveform, _ = self.audio.crop(
                            file, chunk, duration=duration, mode="pad")
                    X.append(waveform[:, :num_samples])
                    y.append(ci)
            yield TrainingBatch(X=np.stack(X),
                                y=np.asarray(y, dtype=np.int32))

    def train__len__(self) -> int:
        total = sum(seg.duration for turns in self._speech_turns.values()
                    for _, seg in turns)
        return max(self.batch_size, math.floor(total / self.duration))

    def prepare_validation(self):
        """Representation learning validates on verification trials
        (pipelines.speaker_verification.verification_trials_eer), not on a
        fixed chunk grid — nothing for the generic validate loop to do."""
        return []

    def default_metric(self) -> List:
        """[EqualErrorRate, AUROC] over verification-trial scores
        (parity: reference tasks/embedding/mixins.py:122-128)."""
        from ..metrics.auroc import BinnedAUROC
        from ..metrics.streaming import EqualErrorRate
        return [EqualErrorRate(), BinnedAUROC()]

    def loss(self, model, params, batch):
        """Joint loss; class prototypes live in params["arcface"]."""
        embeddings = model.apply_fn(
            {k: v for k, v in params.items() if k != "arcface"},
            jnp.asarray(batch.X))
        return arcface_loss(embeddings, jnp.asarray(batch.y),
                            params["arcface"],
                            margin_deg=self.margin, scale=self.scale)


# the reference splits the class-balanced sampling mixin
# (tasks/embedding/mixins.py:43) from the ArcFace task; here they are one
# class, exported under both names
SupervisedRepresentationLearningTaskMixin = \
    SupervisedRepresentationLearningWithArcFace
