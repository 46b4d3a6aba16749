"""Clustering hardening tests (dense relabel, clamped VBx fallback)."""

import numpy as np


def test_assign_embeddings_dense_relabel_on_sparse_cluster_ids():
    """Sparse train-cluster ids (a zero-member id mid-range, as the
    jittable KMeans can produce) are densely relabeled before centroid
    building — no zero-vector centroid, no NaN cosine column that argmax
    would route every embedding to."""
    from pyannote_audio_tpu.pipelines.clustering import \
        AgglomerativeClustering

    c = AgglomerativeClustering()
    rng = np.random.default_rng(0)
    emb = rng.standard_normal((3, 2, 8)).astype(np.float64)
    emb /= np.linalg.norm(emb, axis=2, keepdims=True)
    chunk_idx = np.array([0, 0, 1, 1, 2, 2])
    speaker_idx = np.array([0, 1, 0, 1, 0, 1])
    # ids {0, 2}: id 1 has no members
    train_clusters = np.array([0, 2, 0, 2, 0, 2])
    hard, soft, centroids = c.assign_embeddings(
        emb, chunk_idx, speaker_idx, train_clusters)
    assert centroids.shape[0] == 2           # dense: two real clusters
    assert np.isfinite(soft).all()
    assert set(np.unique(hard)) <= {0, 1}


def test_vbx_pinned_speakers_exceeding_survivors(tmp_path):
    """num_speakers pinned above the number of surviving embeddings must
    not crash the KMeans fallback: the resolved (clamped) cluster count
    is used."""
    from pyannote_audio_tpu.core.plda import PLDA
    from pyannote_audio_tpu.pipelines.clustering import VBxClustering

    rng = np.random.default_rng(0)
    dim, latent = 16, 8
    tr = np.linalg.qr(rng.standard_normal((latent, latent)))[0]
    plda = PLDA(mean1=rng.standard_normal(dim) * 0.01,
                mean2=rng.standard_normal(latent) * 0.01,
                lda=rng.standard_normal((dim, latent)) * 0.1,
                plda_mu=rng.standard_normal(latent) * 0.01,
                plda_tr=tr,
                plda_psi=np.abs(rng.standard_normal(latent)) + 0.5)
    c = VBxClustering(plda)
    c.instantiate({"threshold": 0.6, "Fa": 0.07, "Fb": 0.8})

    # 3 surviving embeddings (3 chunks x 1 active speaker)
    emb = rng.standard_normal((3, 2, dim))
    emb[:, 1] = np.nan                       # second speaker never valid
    seg = np.zeros((3, 20, 2), np.float32)
    seg[:, :, 0] = 1.0
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    swf = SlidingWindowFeature(
        seg, SlidingWindow(start=0.0, duration=2.0, step=1.0))
    hard, soft, centroids = c(emb, segmentations=swf, num_clusters=4)
    assert centroids.shape[0] <= 3           # clamped to survivors
    assert np.isfinite(centroids).all()
