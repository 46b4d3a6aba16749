"""PixIT: joint speaker diarization + MixIT speech separation.

Parity: /root/reference/src/pyannote/audio/tasks/separation/PixIT.py
(Kalda et al., Odyssey 2024): dual Specifications (diarization,
separation) (:313-334), mixtures-of-mixtures built from same-file
non-overlapping single-speaker regions (:819+), joint loss = PIT
diarization BCE + MixIT negative SI-SDR (:874-951).

TPU-native MixIT: the 2^n_src mixture partitions are enumerated as a
static (P, n_src) assignment matrix — one einsum + argmin, no host
Hungarian (the reference wraps asteroid's MixITLossWrapper).
"""

from __future__ import annotations

import itertools
from typing import Dict, Iterator, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.model import Problem, Resolution, Specifications
from ..core.segment import Segment
from ..core.task import Task, TrainingBatch, create_rng_for_worker
from ..ops.losses import binary_cross_entropy
from ..ops.permutation import permutate_jax
from ..utils.database import Protocol


def negative_sisdr(estimate: jnp.ndarray, target: jnp.ndarray
                   ) -> jnp.ndarray:
    """-SI-SDR in dB over the last axis (higher SI-SDR = better)."""
    target = target - jnp.mean(target, axis=-1, keepdims=True)
    estimate = estimate - jnp.mean(estimate, axis=-1, keepdims=True)
    dot = jnp.sum(estimate * target, axis=-1, keepdims=True)
    energy = jnp.sum(target ** 2, axis=-1, keepdims=True) + 1e-8
    projection = dot / energy * target
    noise = estimate - projection
    ratio = jnp.sum(projection ** 2, axis=-1) / \
        (jnp.sum(noise ** 2, axis=-1) + 1e-8)
    return -10.0 * jnp.log10(ratio + 1e-8)


def mixit_partitions(n_src: int) -> np.ndarray:
    """(P, n_src) binary matrices assigning sources to mixture 1."""
    rows = [np.array(bits, dtype=np.float32)
            for bits in itertools.product([0.0, 1.0], repeat=n_src)
            if 0 < sum(bits) < n_src]
    return np.stack(rows)


def mixit_loss(est_sources: jnp.ndarray,   # (B, T, n_src)
               mix1: jnp.ndarray,          # (B, T)
               mix2: jnp.ndarray,
               weight: "jnp.ndarray" = None) -> jnp.ndarray:
    """Min over source-to-mixture assignments of summed neg SI-SDR."""
    parts = jnp.asarray(mixit_partitions(est_sources.shape[-1]))  # (P, S)
    # candidate mixture estimates: (B, P, T)
    est1 = jnp.einsum("bts,ps->bpt", est_sources, parts)
    est2 = jnp.einsum("bts,ps->bpt", est_sources, 1.0 - parts)
    # MEAN over the two mixtures (asteroid multisrc_neg_sisdr averages
    # over sources; summing would double the effective separation weight
    # in the (1-w)*seg + w*sep blend — reference PixIT.py:221,995-996)
    loss = 0.5 * (negative_sisdr(est1, mix1[:, None, :])
                  + negative_sisdr(est2, mix2[:, None, :]))  # (B, P)
    per_item = jnp.min(loss, axis=-1)                        # (B,)
    if weight is None:
        return jnp.mean(per_item)
    # weighted mean: items without a drawable MoM carry weight 0 (the
    # reference skips the batch entirely, PixIT common_step) — a
    # fabricated zero mixture would otherwise force >= 1 estimated
    # source to match digital silence (~+80 dB neg-SI-SDR term)
    w = jnp.asarray(weight)
    return jnp.sum(per_item * w) / jnp.maximum(jnp.sum(w), 1.0)


def pixit_optimizer(lr: float = 1e-3, wavlm_lr: float = 1e-5,
                    gradient_clip_val: float = 5.0):
    """Two-group optimizer: separate (smaller) WavLM learning rate.

    Parity: the reference fine-tunes WavLM with its own optimizer under
    lightning manual optimization (PixIT.py:1011-1026,
    ToTaToNet automatic_optimization=wavlm_frozen) — the TPU-native
    equivalent is one ``optax.multi_transform`` whose label function
    routes every parameter under a ``wavlm`` subtree to its own adam,
    with the reference's gradient_clip_val=5.0 norm clip around both.
    Pass the result as ``Trainer(optimizer=...)``.
    """
    import optax

    def label_fn(params):
        def label(path, _leaf):
            return "wavlm" if any(
                str(getattr(p, "key", getattr(p, "idx", p))) == "wavlm"
                for p in path) else "rest"
        return jax.tree_util.tree_map_with_path(label, params)

    tx = optax.multi_transform(
        {"wavlm": optax.adam(wavlm_lr), "rest": optax.adam(lr)}, label_fn)
    return optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)


class ValDataset:
    """Iterable over PixIT's fixed validation-chunk grid.

    Parity: ValDataset(IterableDataset) (reference
    tasks/separation/PixIT.py:70-90) — PixIT validation is *iterable*
    (not indexed) so chunk preparation runs the same path as training.
    """

    def __init__(self, task: "PixIT"):
        self.task = task
        self._grid = task.prepare_validation()

    def __iter__(self):
        rng = np.random.default_rng(self.task.seed)
        for file, chunk in self._grid:
            yield self.task.prepare_chunk(file, chunk, rng)

    def __len__(self) -> int:
        return len(self._grid)


class PixIT(Task):
    """Joint diarization + separation training."""

    #: Trainer.validate sweeps OptimalDiarizationErrorRate over the raw
    #: sigmoid multilabel outputs (reference default_metric: the
    #: Optimal* family, PixIT.py:1030-1042)
    val_optimal_der = True

    def __init__(
        self,
        protocol: Protocol,
        duration: float = 5.0,
        max_speakers_per_chunk: int = 3,
        separation_loss_weight: float = 0.5,
        **kwargs,
    ):
        super().__init__(protocol, duration=duration, **kwargs)
        self.max_speakers_per_chunk = max_speakers_per_chunk
        self.separation_loss_weight = separation_loss_weight

    @property
    def val_monitor(self):
        return "der/val/optimal", "min"

    def default_metric(self) -> Dict:
        """Optimal (threshold-swept) DER family (parity: reference
        tasks/separation/PixIT.py:1030-1042)."""
        from ..metrics.streaming import (OptimalDiarizationErrorRate,
                                         OptimalDiarizationErrorRateThreshold,
                                         OptimalFalseAlarmRate,
                                         OptimalMissedDetectionRate,
                                         OptimalSpeakerConfusionRate)
        return {
            "DiarizationErrorRate": OptimalDiarizationErrorRate(),
            "DiarizationErrorRate/Threshold":
                OptimalDiarizationErrorRateThreshold(),
            "DiarizationErrorRate/Confusion":
                OptimalSpeakerConfusionRate(),
            "DiarizationErrorRate/Miss": OptimalMissedDetectionRate(),
            "DiarizationErrorRate/FalseAlarm": OptimalFalseAlarmRate(),
        }

    def setup(self, model=None) -> None:
        super().setup(model)
        classes = [f"speaker#{i + 1}"
                   for i in range(self.max_speakers_per_chunk)]
        self.specifications = (
            Specifications(problem=Problem.MULTI_LABEL_CLASSIFICATION,
                           resolution=Resolution.FRAME,
                           duration=self.duration, classes=classes,
                           permutation_invariant=True),
            Specifications(problem=Problem.REGRESSION,
                           resolution=Resolution.FRAME,
                           duration=self.duration, classes=classes,
                           permutation_invariant=True),
        )

    # -- mixture-of-mixtures sampling -------------------------------------

    def _single_speaker_regions(self, file) -> List[Tuple[Segment, str]]:
        """Regions where exactly one speaker is active.

        Annotation-derived and static per file, so the result is cached
        on the file dict — recomputing the timeline algebra for EVERY
        training file on every draw made batch construction
        O(corpus x timeline ops) per chunk.
        """
        cached = file.get("_single_speaker_regions")
        if cached is not None:
            return cached
        annotation = file["annotation"]
        out = []
        for label in annotation.labels():
            own = annotation.label_timeline(label).support()
            others = annotation.subset([label], invert=True) \
                .get_timeline().support()
            for seg in own:
                for clean in others.gaps(support=seg).crop(seg):
                    if clean.duration >= self.duration:
                        out.append((clean, label))
        try:
            file["_single_speaker_regions"] = out
        except TypeError:
            pass                       # immutable mapping: skip caching
        return out

    def draw_mom(self, rng: np.random.Generator
                 ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
        """Two same-file single-speaker chunks -> (mix1, mix2)."""
        candidates = [f for f in self._train_files
                      if len(self._single_speaker_regions(f)) >= 2]
        if not candidates:
            return None
        file = candidates[rng.integers(len(candidates))]
        regions = self._single_speaker_regions(file)
        (r1, l1), (r2, l2) = (regions[i] for i in
                              rng.choice(len(regions), 2, replace=False))
        if l1 == l2 and len({l for _, l in regions}) > 1:
            others = [(r, l) for r, l in regions if l != l1]
            r2, l2 = others[rng.integers(len(others))]

        def crop(region):
            start = region.start + rng.uniform() * \
                max(region.duration - self.duration, 0.0)
            waveform, _ = self.audio.crop(
                file, Segment(start, start + self.duration),
                duration=self.duration, mode="pad")
            return waveform[0]
        return crop(r1), crop(r2)

    def train_batches(self, epoch: int = 0, worker_id: int = 0,
                      rank: int = 0) -> Iterator[TrainingBatch]:
        rng = create_rng_for_worker(self.seed, epoch=epoch,
                                    worker_id=worker_id, rank=rank)
        num_batches = max(1, self.train__len__() // self.batch_size)
        num_samples = int(round(self.duration * self.audio.sample_rate))
        for _ in range(num_batches):
            X, y, mix1, mix2, mom_weight = [], [], [], [], []
            while len(X) < self.batch_size:
                file, chunk = self.draw_chunk(rng)
                labels = file["annotation"].crop(chunk).labels()
                if len(labels) > self.max_speakers_per_chunk:
                    continue
                waveform, _ = self.audio.crop(file, chunk,
                                              duration=self.duration,
                                              mode="pad")
                target = self._frame_targets(file, chunk, labels)
                X.append(waveform)
                y.append(target)
                mom = self.draw_mom(rng)
                if mom is None:
                    # no drawable MoM: keep static shapes with a dummy
                    # pair but zero its weight in mixit_loss (the
                    # reference skips such batches, PixIT common_step)
                    mom = (waveform[0], np.zeros_like(waveform[0]))
                    mom_weight.append(0.0)
                else:
                    mom_weight.append(1.0)
                mix1.append(mom[0][:num_samples])
                mix2.append(mom[1][:num_samples])
            yield TrainingBatch(
                X=np.stack(X), y=np.stack(y),
                meta={"mix1": np.stack(mix1), "mix2": np.stack(mix2),
                      "mom_weight": np.asarray(mom_weight, np.float32)})

    def _frame_targets(self, file, chunk, labels) -> np.ndarray:
        if self.model is not None:
            num_samples = int(round(self.duration
                                    * self.audio.sample_rate))
            num_frames = self.model.num_frames(num_samples)
        else:
            num_frames = int(round(self.duration * 125))
        step = self.duration / num_frames
        K = self.max_speakers_per_chunk
        data = np.zeros((num_frames, K), dtype=np.float32)
        for seg, _, label in file["annotation"].crop(chunk).itertracks(
                yield_label=True):
            if label not in labels:
                continue
            k = labels.index(label)
            if k >= K:
                continue
            i0 = int(round((seg.start - chunk.start) / step))
            i1 = int(round((seg.end - chunk.start) / step))
            data[max(i0, 0):min(i1, num_frames), k] = 1.0
        return data

    # -- validation --------------------------------------------------------

    def prepare_chunk(self, file: Dict, chunk: Segment,
                      rng: np.random.Generator) -> Dict:
        """Validation chunk: waveform + frame targets (no drawn MoM —
        the within-batch MoM in ``loss`` covers separation, as the
        reference's common_step does for validation batches)."""
        cropped = file["annotation"].crop(chunk)
        labels = cropped.labels()
        if len(labels) > self.max_speakers_per_chunk:
            # keep the most talkative speakers (reference PixIT collate_y
            # sorts by descending chunk speech duration, :777-784)
            labels = sorted(
                labels, key=lambda l: cropped.label_duration(l),
                reverse=True)[:self.max_speakers_per_chunk]
        waveform, _ = self.audio.crop(file, chunk,
                                      duration=self.duration, mode="pad")
        return {"X": waveform,
                "y": self._frame_targets(file, chunk, labels)}

    # -- loss --------------------------------------------------------------

    def loss(self, model, params, batch: TrainingBatch):
        """(1 - w) * segmentation + w * separation (reference
        training_step:996-999 weighting)."""
        X = jnp.asarray(batch.X)
        y = jnp.asarray(batch.y)
        diar, _ = model.apply_fn(params, X)
        # PIT diarization BCE: align predicted sources to target speakers
        n = min(diar.shape[1], y.shape[1])
        permuted, _ = permutate_jax(y[:, :n], diar[:, :n])
        diar_loss = binary_cross_entropy(permuted, y[:, :n])

        meta = batch.meta or {}
        mom_weight = None
        if "mix1" in meta:
            mix1 = jnp.asarray(meta["mix1"])
            mix2 = jnp.asarray(meta["mix2"])
            if "mom_weight" in meta:
                mom_weight = jnp.asarray(meta["mom_weight"])
        elif X.shape[0] >= 2:
            # no drawn MoM (validation): pair samples WITHIN the batch,
            # mom = even + odd — the reference common_step:905-940 recipe
            even = X.shape[0] - X.shape[0] % 2
            mix1 = X[0:even:2, 0]
            mix2 = X[1:even:2, 0]
        else:
            # single-sample batch: no MoM possible (reference common_step
            # skips these). Keep the (1-w) weighting so the value stays
            # on the same scale as every other batch.
            return (1.0 - self.separation_loss_weight) * diar_loss
        mom = (mix1 + mix2)[:, None, :]
        _, est_sources = model.apply_fn(params, mom)
        sep_loss = mixit_loss(est_sources, mix1, mix2,
                              weight=mom_weight)
        w = self.separation_loss_weight
        return (1.0 - w) * diar_loss + w * sep_loss
