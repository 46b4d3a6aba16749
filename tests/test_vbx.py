"""VBx EM tests: numpy reference vs jittable on-device version."""

import numpy as np
import pytest
from scipy.special import softmax

from pyannote_audio_tpu.utils.vbx import cluster_vbx, vbx_em, vbx_em_jax


def _toy_problem(seed=0, n_per=40, dim=8):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((3, dim)) * 4.0
    x = np.concatenate([c + 0.3 * rng.standard_normal((n_per, dim))
                        for c in centers])
    truth = np.repeat(np.arange(3), n_per)
    phi = np.full(dim, 8.0)
    return x.astype(np.float32), truth, phi


def test_vbx_em_separates_clusters():
    x, truth, phi = _toy_problem()
    # AHC-style init: noisy one-hot of the truth with some errors
    rng = np.random.default_rng(1)
    init = truth.copy()
    flip = rng.choice(len(init), size=len(init) // 5, replace=False)
    init[flip] = rng.integers(0, 3, size=len(flip))
    gamma, pi = cluster_vbx(init, x, phi, fa=0.3, fb=1.0, max_iters=20)
    pred = gamma.argmax(axis=1)
    # co-membership agreement with the ground truth
    same_pred = pred[:, None] == pred[None, :]
    same_true = truth[:, None] == truth[None, :]
    assert (same_pred == same_true).mean() > 0.95


def test_vbx_jax_matches_numpy():
    x, truth, phi = _toy_problem(seed=2)
    one_hot = np.zeros((len(truth), 3))
    one_hot[np.arange(len(truth)), truth] = 1.0
    gamma0 = softmax(one_hot * 7.0, axis=1)

    gamma_np, pi_np, _ = vbx_em(x, phi, fa=0.3, fb=1.0,
                                gamma=gamma0.copy(), max_iters=15,
                                epsilon=-1.0)  # disable early stop
    gamma_j, pi_j, _ = vbx_em_jax(x, phi, fa=0.3, fb=1.0,
                                  gamma=gamma0, max_iters=15)
    np.testing.assert_allclose(np.asarray(pi_j), pi_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gamma_j), gamma_np, atol=1e-3)


def test_vbx_prunes_redundant_speakers():
    x, truth, phi = _toy_problem(seed=3)
    # init with 6 speakers (3 real + 3 redundant splits)
    init = truth.copy()
    init[::7] += 3
    gamma, pi = cluster_vbx(init, x, phi, fa=0.3, fb=6.0, max_iters=25)
    assert (pi > 1e-3).sum() <= 4  # redundant speakers decay


def test_cluster_vbx_device_gate(monkeypatch):
    """PYANNOTE_TPU_DEVICE_VBX=1 routes cluster_vbx through the jittable
    EM and reproduces the numpy result."""
    x, truth, phi = _toy_problem(seed=4)
    gamma_np, pi_np = cluster_vbx(truth, x, phi, fa=0.3, fb=1.0,
                                  max_iters=15)
    monkeypatch.setenv("PYANNOTE_TPU_DEVICE_VBX", "1")
    gamma_dev, pi_dev = cluster_vbx(truth, x, phi, fa=0.3, fb=1.0,
                                    max_iters=15)
    assert isinstance(gamma_dev, np.ndarray)
    np.testing.assert_allclose(pi_dev, pi_np, atol=1e-3)
    assert (gamma_dev.argmax(1) == gamma_np.argmax(1)).mean() == 1.0


def test_vbx_em_jax_default_gamma_matches_vbx_em_init():
    """vbx_em_jax(gamma=None, max_speakers=...) works and uses the same
    host random init as vbx_em (seed 0)."""
    import numpy as np

    from pyannote_audio_tpu.utils.vbx import vbx_em, vbx_em_jax

    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, 8)).astype(np.float32)
    phi = np.linspace(0.5, 2.0, 8).astype(np.float32)
    g_np, pi_np, _ = vbx_em(x, phi, max_speakers=4, max_iters=5,
                            epsilon=-1.0)  # no early stop: fixed iters
    g_j, pi_j = vbx_em_jax(x, phi, max_speakers=4, max_iters=5)[:2]
    np.testing.assert_allclose(np.asarray(g_j), g_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pi_j), pi_np, atol=1e-4)

    import pytest
    with pytest.raises(ValueError):
        vbx_em_jax(x, phi)
