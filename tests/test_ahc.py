"""On-device AHC (ops/ahc.py) vs scipy centroid linkage."""

import numpy as np
import pytest
from scipy.cluster.hierarchy import fcluster, linkage

from pyannote_audio_tpu.ops.ahc import (ahc_on_device, centroid_linkage,
                                        device_linkage,
                                        fcluster_by_distance)


def _blobs(n_clusters=3, per=12, dim=8, spread=0.05, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4
    x = np.concatenate([centers[k] + spread * rng.standard_normal((per, dim))
                        for k in range(n_clusters)])
    truth = np.repeat(np.arange(n_clusters), per)
    perm = rng.permutation(len(x))
    return x[perm].astype(np.float32), truth[perm]


def _co_membership(a, b):
    sa = a[:, None] == a[None, :]
    sb = b[:, None] == b[None, :]
    return (sa == sb).mean()


def test_device_linkage_matches_scipy_heights():
    x, _ = _blobs()
    ours = device_linkage(x)
    ref = linkage(x.astype(np.float64), method="centroid",
                  metric="euclidean")
    # same multiset of merge heights (tie-breaking may reorder equal ones)
    # f32 device vs f64 scipy: the ||a||^2+||b||^2-2ab expansion costs
    # a few 1e-4 of absolute precision at these magnitudes
    np.testing.assert_allclose(np.sort(ours[:, 2]), np.sort(ref[:, 2]),
                               rtol=5e-3, atol=5e-4)
    # sizes column: final merge always covers all leaves
    assert ours[-1, 3] == len(x)


def test_device_fcluster_matches_scipy_assignments():
    x, truth = _blobs()
    ours = device_linkage(x)
    ref = linkage(x.astype(np.float64), method="centroid",
                  metric="euclidean")
    threshold = 1.0  # well inside the gap between blob spread and centers
    ours_c = fcluster(ours, threshold, criterion="distance")
    ref_c = fcluster(ref, threshold, criterion="distance")
    assert _co_membership(ours_c, ref_c) == 1.0
    assert _co_membership(ours_c, truth) == 1.0


def test_ahc_on_device_end_to_end():
    x, truth = _blobs(n_clusters=2, per=20, seed=1)
    clusters = ahc_on_device(x, threshold=0.5, unit_norm=True)
    assert clusters.min() == 0
    assert _co_membership(clusters, truth) == 1.0


def test_fcluster_by_distance_matches_scipy_cut():
    x, _ = _blobs(seed=2)
    merges, heights = centroid_linkage(x)
    mat = device_linkage(x)
    for thr in (0.2, 1.0, 5.0):
        ours = fcluster_by_distance(np.asarray(merges), np.asarray(heights),
                                    len(x), thr)
        ref = fcluster(mat, thr, criterion="distance")
        assert _co_membership(ours, ref) == 1.0


def test_agglomerative_no_overmerge_at_target_count():
    """Reference regression (tests/test_clustering.py, pyannote issue #1525):
    when the threshold cut already yields num_clusters, the iteration-based
    re-cut must not merge further."""
    from pyannote_audio_tpu.pipelines.clustering import \
        AgglomerativeClustering
    embeddings = np.array([[1.0, 1.0, 1.0, 1.0], [1.0, 2.0, 1.0, 2.0]])
    clustering = AgglomerativeClustering()
    clustering.instantiate({"method": "centroid", "min_cluster_size": 0,
                            "threshold": 0.0})
    clusters = clustering.cluster(embeddings=embeddings, min_clusters=2,
                                  max_clusters=2, num_clusters=2)
    np.testing.assert_array_equal(clusters, [0, 1])


def test_pipeline_device_ahc_backend(monkeypatch):
    from pyannote_audio_tpu.pipelines.clustering import \
        AgglomerativeClustering
    monkeypatch.setenv("PYANNOTE_TPU_DEVICE_AHC", "1")
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((2, 16)) * 5
    num_chunks, num_speakers = 15, 2
    emb = np.zeros((num_chunks, num_speakers, 16))
    truth = np.zeros((num_chunks, num_speakers), int)
    for c in range(num_chunks):
        for s in range(num_speakers):
            k = (c + s) % 2
            truth[c, s] = k
            emb[c, s] = centers[k] + 0.05 * rng.standard_normal(16)
    seg = np.zeros((num_chunks, 10, num_speakers), np.float32)
    for s in range(num_speakers):
        seg[:, s * 4:(s + 1) * 4, s] = 1.0
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    swf = SlidingWindowFeature(seg, SlidingWindow(duration=1.0, step=0.5))
    pipeline = AgglomerativeClustering()
    pipeline.instantiate({"method": "centroid", "threshold": 0.5,
                          "min_cluster_size": 1})
    hard, _, centroids = pipeline(embeddings=emb, segmentations=swf)
    assert centroids.shape[0] == 2
    assert _co_membership(hard.reshape(-1), truth.reshape(-1)) > 0.99


def test_kmeans_jax_recovers_blobs():
    from pyannote_audio_tpu.ops.kmeans import kmeans_jax
    x, truth = _blobs(n_clusters=3, per=15, seed=4)
    assign = kmeans_jax(x, 3)
    assert assign.shape == (45,)
    assert _co_membership(assign, truth) == 1.0
    # determinism: same seed -> same assignment
    np.testing.assert_array_equal(assign, kmeans_jax(x, 3))


def test_kmeans_jax_k_exceeds_points_edge():
    from pyannote_audio_tpu.ops.kmeans import kmeans_jax
    x = np.array([[0.0, 0.0], [10.0, 10.0], [0.1, 0.1]], np.float32)
    assign = kmeans_jax(x, 2)
    assert assign[0] == assign[2] != assign[1]


def test_pipeline_device_kmeans_backend(monkeypatch):
    from pyannote_audio_tpu.pipelines.clustering import KMeansClustering
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    monkeypatch.setenv("PYANNOTE_TPU_DEVICE_KMEANS", "1")
    rng = np.random.default_rng(1)
    centers = rng.standard_normal((2, 16)) * 5
    emb = np.stack([[centers[(c + s) % 2] + 0.05 * rng.standard_normal(16)
                     for s in range(2)] for c in range(12)])
    truth = np.array([[(c + s) % 2 for s in range(2)] for c in range(12)])
    seg = np.zeros((12, 10, 2), np.float32)
    seg[:, :4, 0] = 1.0
    seg[:, 4:8, 1] = 1.0
    swf = SlidingWindowFeature(seg, SlidingWindow(duration=1.0, step=0.5))
    pipeline = KMeansClustering()
    pipeline.instantiate({})
    hard, _, centroids = pipeline(embeddings=emb, segmentations=swf,
                                  num_clusters=2)
    assert centroids.shape[0] == 2
    assert _co_membership(hard.reshape(-1), truth.reshape(-1)) > 0.99
