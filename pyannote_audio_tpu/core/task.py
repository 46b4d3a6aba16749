"""Task base: dataset + problem abstraction for training.

TPU-native rebuild of the reference's ``Task(lightning.LightningDataModule)``
(/root/reference/src/pyannote/audio/core/task.py). Design changes:

  * No lightning: a Task is a pure data pipeline (numpy batch iterators with
    deterministic per-(seed, epoch) RNG, parity with utils/random.py) plus a
    jittable ``loss`` closure consumed by ``train.Trainer``.
  * ``prepare_data``'s protocol -> compact-arrays caching (task.py:308-597)
    becomes an in-memory metadata table (list of files with durations); the
    npz cache is written/read the same way when a cache path is given.
  * Chunks are sampled file ∝ annotated duration, uniform start
    (parity: tasks/segmentation/mixins.py:68-136).

``Problem``/``Resolution``/``Specifications`` live in core.model (shared
with inference); re-exported here for API parity with the reference.
"""

from __future__ import annotations

import math
import zlib
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Text, Tuple, Union

import numpy as np

from ..utils.database import Protocol
from .io import Audio
from .model import Problem, Resolution, Specifications  # noqa: F401 re-export
from .segment import Segment


def create_rng_for_worker(seed: int, epoch: int = 0, worker_id: int = 0,
                          rank: int = 0) -> np.random.Generator:
    """Deterministic per-(seed, worker, rank, epoch) RNG.

    Parity: utils/random.py:31-66 (adler32 of the identity tuple).
    """
    identity = f"{seed}|{worker_id}|{rank}|{epoch}".encode()
    return np.random.default_rng(zlib.adler32(identity))


@dataclass
class TrainingBatch:
    X: np.ndarray                       # (batch, channels, samples)
    y: Optional[np.ndarray] = None      # task-dependent target
    weight: Optional[np.ndarray] = None  # (batch, frames, 1) loss weight
    meta: Optional[Dict] = None


class Task:
    """Base class for all tasks."""

    def __init__(
        self,
        protocol: Protocol,
        duration: float = 2.0,
        min_duration: Optional[float] = None,
        warm_up: Union[float, Tuple[float, float]] = 0.0,
        batch_size: int = 32,
        num_workers: Optional[int] = None,
        seed: int = 42,
        cache: Optional[str] = None,
        balance: Optional[Sequence[Text]] = None,
    ):
        self.protocol = protocol
        # metadata keys to balance chunks across (parity: the cartesian-
        # product balancing of tasks/segmentation/mixins.py:162-181)
        self.balance = list(balance) if balance else None
        self.duration = duration
        self.min_duration = duration if min_duration is None else min_duration
        if isinstance(warm_up, (int, float)):
            warm_up = (float(warm_up), float(warm_up))
        self.warm_up = warm_up
        self.batch_size = batch_size
        self.seed = seed
        self.cache = cache
        self.audio = Audio(sample_rate=16000, mono="downmix")
        self._specifications: Optional[Specifications] = None
        self._prepared = False
        self._train_files: List[Dict] = []
        self.model = None

    # -- metadata ----------------------------------------------------------

    def prepare_data(self) -> None:
        """Scan the protocol and collect per-file metadata.

        With ``cache`` set (parity: Task(cache=...) and the prepared-data
        npz of the reference, core/task.py prepare_data), the per-file
        usable regions are stored in an npz; subsequent runs skip the
        protocol scan's audio-header reads entirely.
        """
        if self._prepared:
            return
        cached_regions = None
        if self.cache is not None:
            from pathlib import Path
            cache_path = Path(self.cache)
            if cache_path.exists():
                with np.load(cache_path) as z:
                    cached_regions = {name[len("uri:"):]: z[name]
                                      for name in z.files
                                      if name.startswith("uri:")}
        self._train_files = []
        for file in self.protocol.train():
            uri = file.get("uri")
            if cached_regions is not None and uri in cached_regions:
                regions = [Segment(float(s), float(e))
                           for s, e in cached_regions[uri]]
            else:
                annotated = file.get("annotated")
                if annotated is None:
                    duration = self.audio.get_duration(file)
                    regions = [Segment(0, duration)]
                else:
                    regions = [s for s in annotated
                               if s.duration > self.min_duration]
            total = sum(s.duration for s in regions)
            if total <= 0:
                continue
            file = dict(file)
            file["_regions"] = regions
            file["_annotated_duration"] = total
            self._train_files.append(file)
        if self.cache is not None and cached_regions is None:
            from pathlib import Path
            cache_path = Path(self.cache)
            cache_path.parent.mkdir(parents=True, exist_ok=True)
            np.savez(cache_path, **{
                f"uri:{f['uri']}": np.array(
                    [[s.start, s.end] for s in f["_regions"]], np.float64)
                for f in self._train_files if f.get("uri")})
        self._prepared = True

    def setup(self, model=None) -> None:
        self.prepare_data()
        self.model = model

    @property
    def specifications(self) -> Union[Specifications,
                                      Tuple[Specifications, ...]]:
        if self._specifications is None:
            from .model import UnknownSpecificationsError
            raise UnknownSpecificationsError(
                "Task has no specifications yet: call task.setup() first "
                "(parity: reference core/task.py:76,653).")
        return self._specifications

    @specifications.setter
    def specifications(self, value):
        self._specifications = value

    # -- sampling ----------------------------------------------------------

    def draw_chunk(self, rng: np.random.Generator) -> Tuple[Dict, Segment]:
        """File ∝ annotated duration, region ∝ duration, uniform start.

        With ``balance``, a metadata subgroup (e.g. per database) is drawn
        uniformly first, then a file within it.
        """
        candidates = self._train_files
        if self.balance:
            groups: Dict[Tuple, List[Dict]] = {}
            for f in candidates:
                key = tuple(f.get(k) for k in self.balance)
                groups.setdefault(key, []).append(f)
            keys = sorted(groups, key=str)
            candidates = groups[keys[rng.integers(len(keys))]]
        weights = np.array([f["_annotated_duration"] for f in candidates])
        file = candidates[
            rng.choice(len(candidates), p=weights / weights.sum())]
        regions = file["_regions"]
        region_weights = np.array([r.duration for r in regions])
        region = regions[rng.choice(len(regions),
                                    p=region_weights / region_weights.sum())]
        start = region.start + rng.uniform() * \
            max(region.duration - self.duration, 0.0)
        return file, Segment(start, start + self.duration)

    def prepare_chunk(self, file: Dict, chunk: Segment,
                      rng: np.random.Generator) -> Dict:
        raise NotImplementedError

    def collate(self, chunks: List[Dict]) -> TrainingBatch:
        X = np.stack([c["X"] for c in chunks])
        y = np.stack([c["y"] for c in chunks]) if "y" in chunks[0] else None
        weight = np.stack([c["weight"] for c in chunks]) \
            if "weight" in chunks[0] else None
        # registered batch augmentations (parity: collate_fn applies
        # torch_audiomentations on the batch, mixins.py:202-243)
        from ..augmentation.registry import apply_augmentations
        X, y = apply_augmentations(X, y, when="input")
        return TrainingBatch(X=X, y=y, weight=weight)

    def train_batches(self, epoch: int = 0, worker_id: int = 0,
                      rank: int = 0) -> Iterator[TrainingBatch]:
        """Infinite stream of training batches (bounded by train__len__)."""
        rng = create_rng_for_worker(self.seed, epoch=epoch,
                                    worker_id=worker_id, rank=rank)
        num_batches = max(1, self.train__len__() // self.batch_size)
        for _ in range(num_batches):
            chunks = []
            while len(chunks) < self.batch_size:
                file, chunk = self.draw_chunk(rng)
                prepared = self.prepare_chunk(file, chunk, rng)
                if prepared is not None:
                    chunks.append(prepared)
            yield self.collate(chunks)

    def train__len__(self) -> int:
        """Chunks per epoch = total annotated duration / chunk duration."""
        total = sum(f["_annotated_duration"] for f in self._train_files)
        return max(self.batch_size,
                   math.floor(total / self.duration))

    # -- validation --------------------------------------------------------

    def prepare_validation(self) -> List[Tuple[Dict, Segment]]:
        """Fixed grid of validation chunks (parity: mixins.py:254-289)."""
        chunks = []
        if not hasattr(self.protocol, "development"):
            return chunks          # protocol without a development subset
        for file in self.protocol.development():
            annotated = file.get("annotated")
            regions = list(annotated) if annotated is not None else \
                [Segment(0, self.audio.get_duration(file))]
            for region in regions:
                if region.duration < self.duration:
                    continue
                num = int(region.duration // self.duration)
                for i in range(num):
                    start = region.start + i * self.duration
                    chunks.append(
                        (file, Segment(start, start + self.duration)))
        return chunks

    # -- loss --------------------------------------------------------------

    def loss(self, model, params, batch: TrainingBatch):
        """Jittable scalar loss; implemented per task."""
        raise NotImplementedError

    def augment_params(self, params, rng_key, model):
        """Add task-owned trainable state (e.g. ArcFace prototypes)."""
        return params

    @property
    def val_monitor(self) -> Tuple[str, str]:
        return "loss/val", "min"
