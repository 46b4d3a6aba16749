"""Clustering of per-(chunk, speaker) embeddings.

Behavioral parity with /root/reference/src/pyannote/audio/pipelines/
clustering.py: AHC / KMeans / VBx / Oracle over the (num_chunks,
num_speakers, dim) embedding tensor, with NaN/low-activity filtering,
centroid-based (optionally Hungarian-constrained) assignment and cluster
count constraints.

Division of labor (SURVEY.md §2.9): the embedding matrices here are tiny
(<= few thousand x 256) next to the NN stages, so exact host scipy/sklearn
is used where bit-level determinism matters (linkage tie-breaking, seeded
KMeans); distances/centroids are plain matmuls.
"""

from __future__ import annotations

import warnings
from enum import Enum
from typing import Optional, Tuple

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage
from scipy.optimize import linear_sum_assignment
from scipy.spatial.distance import cdist

from ..core.pipeline import Pipeline
from ..core.plda import PLDA
from ..core.segment import SlidingWindow, SlidingWindowFeature
from ..utils.vbx import cluster_vbx
from .parameter import Categorical, Integer, Uniform


def _device_ahc_enabled() -> bool:
    """On-device centroid linkage (ops/ahc.py) gate; opt-in.

    DER is identical to host scipy (benchmarks/clustering_ab.py,
    docs/PARITY.md), but the embedding matrices are tiny and on a
    relay-attached single chip the extra device dispatches measurably
    LOSE to host scipy (round-2 sweep: ~0.4 s/file) — so host stays the
    default; set PYANNOTE_TPU_DEVICE_AHC=1 for fully on-device serving.
    """
    from ..utils.runtime import device_flag
    return device_flag("PYANNOTE_TPU_DEVICE_AHC",
                       accelerator_default=False)


class BaseClustering(Pipeline):
    """Shared orchestration: filter -> cluster -> assign."""

    expects_num_clusters: bool = False

    def __init__(self, metric: str = "cosine",
                 constrained_assignment: bool = False):
        super().__init__()
        self.metric = metric
        self.constrained_assignment = constrained_assignment

    def set_num_clusters(self, num_embeddings: int,
                         num_clusters: Optional[int] = None,
                         min_clusters: Optional[int] = None,
                         max_clusters: Optional[int] = None):
        """Resolve (num, min, max) cluster-count constraints."""
        min_clusters = num_clusters or min_clusters or 1
        min_clusters = max(1, min(num_embeddings, min_clusters))
        max_clusters = num_clusters or max_clusters or num_embeddings
        max_clusters = max(1, min(num_embeddings, max_clusters))
        if min_clusters > max_clusters:
            raise ValueError(
                f"min_clusters ({min_clusters}) must be <= max_clusters "
                f"({max_clusters})")
        if min_clusters == max_clusters:
            num_clusters = min_clusters
        return num_clusters, min_clusters, max_clusters

    def filter_embeddings(
        self,
        embeddings: np.ndarray,
        segmentations: Optional[SlidingWindowFeature] = None,
        min_active_ratio: float = 0.2,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Keep embeddings that are valid and clean-speech-active enough.

        A speaker must speak *alone* for at least ``min_active_ratio`` of
        the chunk, and its embedding must be NaN-free.
        """
        clean_frames = getattr(segmentations, "precomputed_clean_frames",
                               None)
        if clean_frames is not None:
            # computed on device by ops.diarize_fused.fused_count_stats;
            # avoids materializing the full score tensor on host
            num_frames = int(segmentations.device_data.shape[1])
        else:
            seg = segmentations.data
            _, num_frames, _ = seg.shape
            alone = np.sum(seg, axis=2, keepdims=True) == 1
            clean_frames = np.sum(seg * alone, axis=1)  # (chunks, speakers)
        active = clean_frames >= min_active_ratio * num_frames
        valid = ~np.any(np.isnan(embeddings), axis=2)
        chunk_idx, speaker_idx = np.where(active & valid)
        return embeddings[chunk_idx, speaker_idx], chunk_idx, speaker_idx

    def constrained_argmax(self, soft_clusters: np.ndarray) -> np.ndarray:
        """Per-chunk Hungarian: each local speaker -> distinct cluster."""
        soft = np.nan_to_num(soft_clusters, nan=np.nanmin(soft_clusters))
        num_chunks, num_speakers, _ = soft.shape
        hard = np.full((num_chunks, num_speakers), -2, dtype=np.int8)
        for c in range(num_chunks):
            speakers, clusters = linear_sum_assignment(soft[c],
                                                       maximize=True)
            hard[c, speakers] = clusters
        return hard

    def assign_embeddings(self, embeddings: np.ndarray,
                          train_chunk_idx: np.ndarray,
                          train_speaker_idx: np.ndarray,
                          train_clusters: np.ndarray,
                          constrained: bool = False):
        """Centroids from train subset, then closest-centroid assignment."""
        # dense relabel first: sklearn/AHC labels are already dense, but
        # the jittable KMeans (ops/kmeans.py) can leave an id with zero
        # members, whose zero-vector centroid would yield a NaN cosine
        # column that argmax then picks for EVERY embedding
        train_clusters = np.unique(np.asarray(train_clusters),
                                   return_inverse=True)[1]
        num_clusters = int(np.max(train_clusters)) + 1
        num_chunks, num_speakers, dim = embeddings.shape
        train = embeddings[train_chunk_idx, train_speaker_idx]
        centroids = np.stack([
            train[train_clusters == k].mean(axis=0)
            for k in range(num_clusters)])
        dist = cdist(embeddings.reshape(-1, dim), centroids,
                     metric=self.metric)
        soft_clusters = 2.0 - dist.reshape(num_chunks, num_speakers,
                                           num_clusters)
        if constrained:
            hard_clusters = self.constrained_argmax(soft_clusters)
        else:
            hard_clusters = np.argmax(soft_clusters, axis=2)
        return hard_clusters, soft_clusters, centroids

    def cluster(self, embeddings: np.ndarray, min_clusters: int,
                max_clusters: int, num_clusters: Optional[int] = None
                ) -> np.ndarray:
        raise NotImplementedError

    def __call__(self, embeddings: np.ndarray,
                 segmentations: Optional[SlidingWindowFeature] = None,
                 num_clusters: Optional[int] = None,
                 min_clusters: Optional[int] = None,
                 max_clusters: Optional[int] = None, **kwargs):
        train, chunk_idx, speaker_idx = self.filter_embeddings(
            embeddings, segmentations=segmentations)
        num_embeddings = train.shape[0]
        num_clusters, min_clusters, max_clusters = self.set_num_clusters(
            num_embeddings, num_clusters=num_clusters,
            min_clusters=min_clusters, max_clusters=max_clusters)

        if max_clusters < 2:
            # single-cluster early exit
            num_chunks, num_speakers, dim = embeddings.shape
            hard = np.zeros((num_chunks, num_speakers), dtype=np.int8)
            soft = np.ones((num_chunks, num_speakers, 1))
            centroids = np.mean(train, axis=0, keepdims=True) \
                if len(train) else np.zeros((1, dim))
            return hard, soft, centroids

        train_clusters = self.cluster(train, min_clusters=min_clusters,
                                      max_clusters=max_clusters,
                                      num_clusters=num_clusters)
        return self.assign_embeddings(
            embeddings, chunk_idx, speaker_idx, train_clusters,
            constrained=self.constrained_assignment)


class AgglomerativeClustering(BaseClustering):
    """Hierarchical clustering with threshold / count constraints."""

    expects_num_clusters = False

    def __init__(self, metric: str = "cosine",
                 constrained_assignment: bool = False):
        super().__init__(metric=metric,
                         constrained_assignment=constrained_assignment)
        self.threshold = Uniform(0.0, 2.0)
        self.method = Categorical(["average", "centroid", "complete",
                                   "median", "single", "ward", "weighted"])
        self.min_cluster_size = Integer(1, 20)

    def cluster(self, embeddings: np.ndarray, min_clusters: int,
                max_clusters: int, num_clusters: Optional[int] = None
                ) -> np.ndarray:
        num_embeddings = embeddings.shape[0]
        min_cluster_size = min(self.min_cluster_size,
                               max(1, round(0.1 * num_embeddings)))
        if num_embeddings == 1:
            return np.zeros((1,), dtype=np.uint8)

        # centroid/median/ward require euclidean: unit-normalize instead
        if self.metric == "cosine" and \
                self.method in ("centroid", "median", "ward"):
            with np.errstate(divide="ignore", invalid="ignore"):
                embeddings = embeddings / np.linalg.norm(
                    embeddings, axis=-1, keepdims=True)
            if self.method == "centroid" and _device_ahc_enabled():
                from ..ops.ahc import device_linkage
                dendrogram = device_linkage(embeddings)
            else:
                dendrogram = linkage(embeddings, method=self.method,
                                     metric="euclidean")
        else:
            dendrogram = linkage(embeddings, method=self.method,
                                 metric=self.metric)

        clusters = fcluster(dendrogram, self.threshold,
                            criterion="distance") - 1

        def large_of(assign):
            uniq, counts = np.unique(assign, return_counts=True)
            return uniq, counts, uniq[counts >= min_cluster_size]

        uniq, counts, large = large_of(clusters)

        if len(large) < min_clusters:
            num_clusters = min_clusters
        elif len(large) > max_clusters:
            num_clusters = max_clusters

        if num_clusters is not None and len(large) != num_clusters:
            # re-cut the dendrogram by iteration index, scanning iterations
            # closest to the threshold first, until the large-cluster count
            # matches the target
            by_iteration = np.copy(dendrogram)
            by_iteration[:, 2] = np.arange(num_embeddings - 1)
            # fallback = the final merge (single cluster), like the
            # reference's best_iteration init (clustering.py:409-410) —
            # never keep a threshold cut that violates the cluster bounds
            best_it, best_num = num_embeddings - 1, 1
            for it in np.argsort(np.abs(dendrogram[:, 2] - self.threshold)):
                if by_iteration[it, 3] < min_cluster_size:
                    continue
                candidate = fcluster(by_iteration, it,
                                     criterion="distance") - 1
                _, _, cand_large = large_of(candidate)
                clusters = candidate
                if abs(len(cand_large) - num_clusters) < \
                        abs(best_num - num_clusters):
                    best_it, best_num = it, len(cand_large)
                if len(cand_large) == num_clusters:
                    break
            if best_num != num_clusters:
                clusters = fcluster(by_iteration, best_it,
                                    criterion="distance") - 1
                warnings.warn(
                    f"Found only {best_num} clusters. Using a smaller "
                    f"value than {min_cluster_size} for "
                    f"`min_cluster_size` might help.")
            uniq, counts, large = large_of(clusters)

        if len(large) == 0:
            return np.zeros_like(clusters)
        small = uniq[counts < min_cluster_size]
        if len(small) > 0:
            # merge each small cluster into its closest large cluster
            large_centroids = np.stack(
                [embeddings[clusters == k].mean(axis=0) for k in large])
            small_centroids = np.stack(
                [embeddings[clusters == k].mean(axis=0) for k in small])
            nearest = np.argmin(
                cdist(large_centroids, small_centroids, metric=self.metric),
                axis=0)
            for i, k in enumerate(small):
                clusters[clusters == k] = large[nearest[i]]
        _, clusters = np.unique(clusters, return_inverse=True)
        return clusters


class KMeansClustering(BaseClustering):
    """Seeded KMeans; requires a known cluster count."""

    expects_num_clusters = True

    def __init__(self, metric: str = "cosine"):
        if metric not in ("cosine", "euclidean"):
            raise ValueError("metric must be 'cosine' or 'euclidean'")
        super().__init__(metric=metric)

    def cluster(self, embeddings: np.ndarray, min_clusters: int,
                max_clusters: int, num_clusters: Optional[int] = None
                ) -> np.ndarray:
        if num_clusters is None:
            raise ValueError("`num_clusters` must be provided.")
        from sklearn.cluster import KMeans
        num_embeddings = embeddings.shape[0]
        if num_embeddings < num_clusters:
            return np.arange(num_embeddings, dtype=np.int32)
        if self.metric == "cosine":
            with np.errstate(divide="ignore", invalid="ignore"):
                embeddings = embeddings / np.linalg.norm(
                    embeddings, axis=-1, keepdims=True)
        from ..utils.runtime import device_flag
        if device_flag("PYANNOTE_TPU_DEVICE_KMEANS",
                       accelerator_default=False):
            from ..ops.kmeans import kmeans_jax
            return kmeans_jax(embeddings, num_clusters)
        return KMeans(n_clusters=num_clusters, n_init=3,
                      random_state=42).fit_predict(embeddings)


class VBxClustering(BaseClustering):
    """AHC-initialized variational Bayes clustering in PLDA space."""

    expects_num_clusters = False

    def __init__(self, plda: PLDA, metric: str = "cosine",
                 constrained_assignment: bool = True):
        super().__init__(metric=metric,
                         constrained_assignment=constrained_assignment)
        self.plda = plda
        self.threshold = Uniform(0.5, 0.8)
        self.Fa = Uniform(0.01, 0.5)
        self.Fb = Uniform(0.01, 15.0)

    def __call__(self, embeddings: np.ndarray,
                 segmentations: Optional[SlidingWindowFeature] = None,
                 num_clusters: Optional[int] = None,
                 min_clusters: Optional[int] = None,
                 max_clusters: Optional[int] = None, **kwargs):
        constrained = self.constrained_assignment
        train, _, _ = self.filter_embeddings(embeddings,
                                             segmentations=segmentations)
        num_chunks, num_speakers, dim = embeddings.shape
        if train.shape[0] < 2:
            hard = np.zeros((num_chunks, num_speakers), dtype=np.int8)
            soft = np.ones((num_chunks, num_speakers, 1))
            centroids = np.mean(train, axis=0, keepdims=True) \
                if len(train) else np.zeros((1, dim))
            return hard, soft, centroids

        # keep the RESOLVED count: it is clamped to the number of
        # surviving embeddings, so the KMeans fallback below can never
        # request more clusters than samples
        num_clusters, min_clusters, max_clusters = self.set_num_clusters(
            train.shape[0], num_clusters=num_clusters,
            min_clusters=min_clusters, max_clusters=max_clusters)

        # AHC initialization on unit-normalized embeddings
        normed = train / np.linalg.norm(train, axis=1, keepdims=True)
        dendrogram = linkage(normed, method="centroid", metric="euclidean")
        ahc = fcluster(dendrogram, self.threshold, criterion="distance") - 1
        _, ahc = np.unique(ahc, return_inverse=True)

        # VBx EM in PLDA latent space
        latent = self.plda(train)
        gamma, pi = cluster_vbx(ahc, latent, self.plda.phi,
                                fa=self.Fa, fb=self.Fb, max_iters=20)

        # centroids from responsibilities of surviving speakers
        keep = pi > 1e-7
        weights = gamma[:, keep]                               # (T, S_kept)
        totals = np.maximum(weights.sum(axis=0)[:, None], 1e-8)
        centroids = (weights.T @ train) / totals

        # fall back to seeded KMeans when count constraints are violated
        auto = centroids.shape[0]
        if auto < min_clusters:
            num_clusters = min_clusters
        elif auto > max_clusters:
            num_clusters = max_clusters
        if num_clusters and num_clusters != auto:
            from sklearn.cluster import KMeans
            constrained = False
            km = KMeans(n_clusters=num_clusters, n_init=3,
                        random_state=42).fit_predict(normed)
            centroids = np.stack([train[km == k].mean(axis=0)
                                  for k in range(num_clusters)])

        dist = cdist(embeddings.reshape(-1, dim), centroids,
                     metric=self.metric)
        soft = 2.0 - dist.reshape(num_chunks, num_speakers, -1)
        if constrained:
            # mask silent local speakers below any valid score. nanmin:
            # NaN embedding rows make plain min() NaN, and the floor
            # would then TIE with (not undercut) every valid score after
            # constrained_argmax's nan_to_num (the reference's
            # soft_clusters.min() at clustering.py:659 shares that flaw)
            floor = np.nanmin(soft) - 1.0
            speaker_frames = getattr(
                segmentations, "precomputed_speaker_frames", None)
            silent = speaker_frames == 0 if speaker_frames is not None \
                else segmentations.data.sum(axis=1) == 0
            soft[silent] = floor
            hard = self.constrained_argmax(soft)
        else:
            hard = np.argmax(soft, axis=2)
        return hard.reshape(num_chunks, num_speakers), soft, centroids


class OracleClustering(BaseClustering):
    """Perfect clustering derived from the reference annotation."""

    expects_num_clusters = True

    def __call__(self, embeddings: Optional[np.ndarray] = None,
                 segmentations: Optional[SlidingWindowFeature] = None,
                 file=None, frames: Optional[SlidingWindow] = None,
                 **kwargs):
        from ..ops.permutation import permutate
        from .utils.oracle import oracle_segmentation

        num_chunks, num_frames, num_speakers = segmentations.data.shape
        window = segmentations.sliding_window
        oracle = oracle_segmentation(file, window, frames=frames)
        file["oracle_segmentations"] = oracle
        _, oracle_num_frames, num_clusters = oracle.data.shape
        n = min(num_frames, oracle_num_frames)
        seg_data = segmentations.data[:, :n]
        oracle_data = oracle.data[:, :n]

        hard = np.full((num_chunks, num_speakers), -2, dtype=np.int8)
        soft = np.zeros((num_chunks, num_speakers, num_clusters))
        for c in range(num_chunks):
            _, perms = permutate(oracle_data[c][None], seg_data[c])
            for j, i in enumerate(perms[0]):
                if i is None:
                    continue
                hard[c, i] = j
                soft[c, i, j] = 1.0

        if embeddings is None:
            return hard, soft, None

        train, chunk_idx, speaker_idx = self.filter_embeddings(
            embeddings, segmentations=segmentations)
        train_clusters = hard[chunk_idx, speaker_idx]
        centroids = np.stack([
            train[train_clusters == k].mean(axis=0)
            if np.any(train_clusters == k)
            else np.zeros(embeddings.shape[-1])
            for k in range(num_clusters)])
        return hard, soft, centroids


class Clustering(Enum):
    AgglomerativeClustering = AgglomerativeClustering
    KMeansClustering = KMeansClustering
    VBxClustering = VBxClustering
    OracleClustering = OracleClustering
