"""Streaming AUROC tests."""

import numpy as np
import pytest

from pyannote_audio_tpu.metrics.auroc import BinnedAUROC


def test_auroc_perfect_separation():
    scores = np.concatenate([np.full(100, 0.9), np.full(100, 0.1)])
    targets = np.concatenate([np.ones(100), np.zeros(100)])
    metric = BinnedAUROC()
    auroc = metric(scores[:, None], targets[:, None])
    assert auroc == pytest.approx(1.0, abs=1e-3)


def test_auroc_random_scores():
    rng = np.random.default_rng(0)
    scores = rng.uniform(size=5000)
    targets = rng.uniform(size=5000) > 0.5
    metric = BinnedAUROC()
    auroc = metric(scores[:, None], targets[:, None])
    assert auroc == pytest.approx(0.5, abs=0.05)


def test_auroc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(1)
    scores = np.clip(rng.normal(0.5, 0.2, 2000)
                     + 0.2 * rng.integers(0, 2, 2000), 0, 1)
    targets = scores + 0.1 * rng.standard_normal(2000) > 0.6
    metric = BinnedAUROC(num_bins=1024)
    ours = metric(scores[:, None], targets[:, None].astype(float))
    theirs = roc_auc_score(targets, scores)
    assert ours == pytest.approx(theirs, abs=0.01)


def test_auroc_streaming_accumulates():
    rng = np.random.default_rng(2)
    metric = BinnedAUROC()
    all_s, all_t = [], []
    for _ in range(5):
        s = rng.uniform(size=200)
        t = (s + 0.3 * rng.standard_normal(200)) > 0.5
        metric.update(s[:, None], t[:, None].astype(float))
        all_s.append(s)
        all_t.append(t)
    single = BinnedAUROC()
    single.update(np.concatenate(all_s)[:, None],
                  np.concatenate(all_t)[:, None].astype(float))
    assert metric.compute() == pytest.approx(single.compute(), abs=1e-9)
