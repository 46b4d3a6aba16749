"""On-device op tests: powerset codec, overlap-add aggregation, LSTM."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.ops.aggregate import aggregate_scores, hamming_weights
from pyannote_audio_tpu.ops.lstm import multilayer_lstm
from pyannote_audio_tpu.ops.powerset import Powerset, build_powerset_mapping


# ---------------------------------------------------------------- powerset

def test_powerset_mapping_3_2():
    m = build_powerset_mapping(3, 2)
    # 1 empty + 3 singles + 3 pairs = 7 states
    assert m.shape == (7, 3)
    np.testing.assert_array_equal(m[0], [0, 0, 0])
    np.testing.assert_array_equal(m[1], [1, 0, 0])
    np.testing.assert_array_equal(m[4], [1, 1, 0])
    assert m.sum(axis=1).max() == 2


def test_powerset_roundtrip():
    ps = Powerset(3, 2)
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 10, 7)).astype(np.float32)
    logp = jnp.asarray(logits - np.log(np.sum(np.exp(logits), -1,
                                              keepdims=True)))
    multi = ps.to_multilabel(logp)
    assert multi.shape == (4, 10, 3)
    back = ps.to_powerset(multi)
    # argmax of powerset == argmax reconstructed
    np.testing.assert_array_equal(np.argmax(np.asarray(back), -1),
                                  np.argmax(logits, -1))


def test_powerset_soft():
    ps = Powerset(2, 1)  # states: {}, {0}, {1}
    logp = jnp.log(jnp.asarray([[0.2, 0.5, 0.3]]))
    soft = np.asarray(ps.to_multilabel(logp, soft=True))
    np.testing.assert_allclose(soft[0], [0.5, 0.3], atol=1e-5)


def test_powerset_permutation():
    ps = Powerset(3, 2)
    perm = ps.permutation_mapping((1, 0, 2))
    m = np.asarray(ps.mapping)
    permuted = m[np.asarray(perm)]
    np.testing.assert_array_equal(permuted, m[:, [1, 0, 2]])


# ---------------------------------------------------------------- aggregate

def test_hamming_matches_torch():
    import torch
    ours = np.asarray(hamming_weights(17))
    theirs = torch.hamming_window(17, periodic=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_aggregate_simple_average():
    # two chunks of 4 frames, overlapping by 2, constant scores 1 and 3
    scores = jnp.asarray(np.stack([np.full((4, 1), 1.0),
                                   np.full((4, 1), 3.0)])).astype(jnp.float32)
    offsets = jnp.asarray([0, 2], dtype=jnp.int32)
    out = np.asarray(aggregate_scores(scores, offsets, 6))
    np.testing.assert_allclose(out[:2, 0], 1.0)
    np.testing.assert_allclose(out[2:4, 0], 2.0)  # average of 1 and 3
    np.testing.assert_allclose(out[4:6, 0], 3.0)


def test_aggregate_missing_frames():
    scores = jnp.ones((1, 2, 1), jnp.float32)
    out = np.asarray(aggregate_scores(scores, jnp.asarray([2]), 6,
                                      missing=np.nan))
    assert np.isnan(out[0, 0]) and np.isnan(out[5, 0])
    assert out[2, 0] == 1.0


def test_aggregate_nan_scores_masked():
    scores = np.ones((2, 3, 1), np.float32)
    scores[1, :, :] = np.nan
    out = np.asarray(aggregate_scores(jnp.asarray(scores),
                                      jnp.asarray([0, 1]), 4))
    np.testing.assert_allclose(out[:3, 0], 1.0)
    assert np.isnan(out[3, 0])


def test_aggregate_chunk_mask():
    scores = np.stack([np.ones((3, 1)), 99 * np.ones((3, 1))]).astype(
        np.float32)
    out = np.asarray(aggregate_scores(
        jnp.asarray(scores), jnp.asarray([0, 0]), 3,
        chunk_mask=jnp.asarray([1.0, 0.0])))
    np.testing.assert_allclose(out[:, 0], 1.0)


# ---------------------------------------------------------------- LSTM

@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_matches_torch(bidirectional, num_layers):
    import torch
    torch.manual_seed(0)
    D, H, B, T = 12, 16, 3, 25
    ref = torch.nn.LSTM(D, H, num_layers=num_layers, batch_first=True,
                        bidirectional=bidirectional)
    x = torch.randn(B, T, D)
    with torch.no_grad():
        expected, _ = ref(x)

    layers = []
    for i in range(num_layers):
        layer = {
            "w_ih": jnp.asarray(getattr(ref, f"weight_ih_l{i}").detach()
                                .numpy()),
            "w_hh": jnp.asarray(getattr(ref, f"weight_hh_l{i}").detach()
                                .numpy()),
            "b_ih": jnp.asarray(getattr(ref, f"bias_ih_l{i}").detach()
                                .numpy()),
            "b_hh": jnp.asarray(getattr(ref, f"bias_hh_l{i}").detach()
                                .numpy()),
        }
        if bidirectional:
            layer.update({
                "w_ih_r": jnp.asarray(
                    getattr(ref, f"weight_ih_l{i}_reverse").detach()
                    .numpy()),
                "w_hh_r": jnp.asarray(
                    getattr(ref, f"weight_hh_l{i}_reverse").detach()
                    .numpy()),
                "b_ih_r": jnp.asarray(
                    getattr(ref, f"bias_ih_l{i}_reverse").detach().numpy()),
                "b_hh_r": jnp.asarray(
                    getattr(ref, f"bias_hh_l{i}_reverse").detach().numpy()),
            })
        layers.append(layer)

    ours = multilayer_lstm(jnp.asarray(x.numpy()), layers,
                           bidirectional=bidirectional)
    np.testing.assert_allclose(np.asarray(ours), expected.numpy(),
                               atol=2e-5)


def test_aggregate_matches_loop_oracle():
    """aggregate_scores == a literal per-chunk overlap-add loop
    (the reference's aggregate semantics, inference.py:498-620)."""
    rng = np.random.default_rng(7)
    num_chunks, frames, C = 13, 17, 3
    scores = rng.standard_normal((num_chunks, frames, C)).astype(np.float32)
    # sprinkle NaNs (missing frames from partial stitching)
    nan_mask = rng.uniform(size=scores.shape) < 0.05
    scores[nan_mask] = np.nan
    offsets = np.sort(rng.integers(0, 40, size=num_chunks)).astype(np.int32)
    total = int(offsets[-1]) + frames + 3
    warm_up = (0.2, 0.1)

    # oracle: literal loop
    hamming = 0.54 - 0.46 * np.cos(
        2 * np.pi * np.arange(frames) / (frames - 1))
    warm = np.ones(frames)
    warm[:round(warm_up[0] * frames)] = 1e-12
    warm[frames - round(warm_up[1] * frames):] = 1e-12
    w = (hamming * warm)[:, None]
    acc = np.zeros((total, C))
    cnt = np.zeros((total, C))
    covered = np.zeros((total, C))
    for c in range(num_chunks):
        s = scores[c]
        mask = ~np.isnan(s)
        sv = np.nan_to_num(s)
        sl = slice(offsets[c], offsets[c] + frames)
        acc[sl] += sv * mask * w
        cnt[sl] += mask * w
        covered[sl] = np.maximum(covered[sl], mask)
    expected = acc / np.maximum(cnt, 1e-12)
    expected[covered == 0] = np.nan

    ours = np.asarray(aggregate_scores(
        jnp.asarray(scores), jnp.asarray(offsets), total,
        hamming=True, warm_up=warm_up, missing=np.nan))
    np.testing.assert_allclose(ours, expected, atol=1e-4, equal_nan=True)


# ------------------------------------------------------- permutate (host API)

def test_permutate_exact_permutations():
    """All six 3-speaker permutations recovered exactly
    (reference tests/utils/test_permutation.py:34-58)."""
    from itertools import permutations as iperm
    from pyannote_audio_tpu.ops.permutation import permutate
    rng = np.random.default_rng(0)
    actual = list(iperm(range(3)))
    y2 = rng.standard_normal((10, 3))
    y1 = np.stack([y2[:, p] for p in actual])
    permutated, perms = permutate(y1, y2)
    assert [tuple(p) for p in perms] == actual
    for p, permutation in enumerate(actual):
        np.testing.assert_allclose(permutated[p], y2[:, permutation],
                                   atol=1e-5)


def test_permutate_less_speakers():
    """y2 has fewer speakers: missing columns map to None
    (reference tests/utils/test_permutation.py:61-85)."""
    from pyannote_audio_tpu.ops.permutation import permutate
    rng = np.random.default_rng(1)
    actual = [(0, 1, None), (0, None, 1), (1, 0, None),
              (1, None, 0), (None, 0, 1), (None, 1, 0)]
    y2 = rng.standard_normal((10, 2))
    y1 = np.zeros((len(actual), 10, 3))
    for p, permutation in enumerate(actual):
        for i, j in enumerate(permutation):
            if j is not None:
                y1[p, :, i] = y2[:, j]
    _, perms = permutate(y1, y2)
    assert [tuple(p) for p in perms] == actual


def test_permutate_more_speakers():
    """y2 has more speakers: extra columns dropped
    (reference tests/utils/test_permutation.py:88+)."""
    from pyannote_audio_tpu.ops.permutation import permutate
    rng = np.random.default_rng(2)
    y2 = rng.standard_normal((10, 3))
    actual = [(0, 1), (1, 0), (2, 1), (1, 2), (0, 2), (2, 0)]
    y1 = np.stack([y2[:, list(p)] for p in actual])
    permutated, perms = permutate(y1, y2)
    assert [tuple(p) for p in perms] == actual
    assert permutated.shape == y1.shape


def test_hysteresis_matches_loop_oracle():
    """Device associative-scan hysteresis == trivial sequential loop on
    random scores (with NaNs), random onset/offset bands."""
    from pyannote_audio_tpu.ops.binarize import hysteresis

    for seed in range(10):
        rng = np.random.default_rng(seed)
        scores = rng.uniform(size=(60, 3)).astype(np.float32)
        scores[rng.uniform(size=scores.shape) < 0.05] = np.nan
        onset = float(rng.uniform(0.55, 0.8))
        offset = float(rng.uniform(0.2, 0.45))

        got = np.asarray(hysteresis(jnp.asarray(scores), onset, offset))

        s = np.nan_to_num(scores)
        expect = np.zeros(s.shape, bool)
        for k in range(s.shape[1]):
            on = s[0, k] >= 0.5 * (onset + offset)
            for t in range(s.shape[0]):
                if s[t, k] > onset:
                    on = True
                elif s[t, k] < offset:
                    on = False
                expect[t, k] = on
        np.testing.assert_array_equal(got, expect), seed
