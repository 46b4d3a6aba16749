"""StatsPool and WeSpeaker ResNet tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.models.blocks.pooling import (interpolate_weights,
                                                      stats_pool)


def _naive_pool(seq, w):
    """Reference math from the pyannote StatsPool contract (pooling.py:30)."""
    v1 = w.sum() + 1e-8
    mean = (seq * w).sum(axis=1) / v1
    dx2 = (seq - mean[:, None]) ** 2
    v2 = (w ** 2).sum()
    var = (dx2 * w).sum(axis=1) / (v1 - v2 / v1 + 1e-8)
    return np.concatenate([mean, np.sqrt(var)])


def test_stats_pool_weighted():
    rng = np.random.default_rng(0)
    seq = rng.standard_normal((2, 6, 20)).astype(np.float32)
    w = rng.uniform(0.1, 1.0, (2, 20)).astype(np.float32)
    out = np.asarray(stats_pool(jnp.asarray(seq), jnp.asarray(w)))
    assert out.shape == (2, 12)
    for b in range(2):
        np.testing.assert_allclose(out[b], _naive_pool(seq[b], w[b]),
                                   atol=1e-4)


def test_stats_pool_unweighted_matches_mean_std():
    rng = np.random.default_rng(1)
    seq = rng.standard_normal((1, 4, 50)).astype(np.float32)
    out = np.asarray(stats_pool(jnp.asarray(seq)))
    np.testing.assert_allclose(out[0, :4], seq[0].mean(axis=1), atol=1e-5)
    np.testing.assert_allclose(out[0, 4:], seq[0].std(axis=1, ddof=1),
                               atol=1e-5)


def test_stats_pool_per_speaker():
    rng = np.random.default_rng(2)
    seq = rng.standard_normal((2, 6, 20)).astype(np.float32)
    w = rng.uniform(0, 1, (2, 3, 20)).astype(np.float32)
    out = np.asarray(stats_pool(jnp.asarray(seq), jnp.asarray(w)))
    assert out.shape == (2, 3, 12)
    # speaker s of batch b == pooling with that weight row alone
    single = np.asarray(stats_pool(jnp.asarray(seq), jnp.asarray(w[:, 1])))
    np.testing.assert_allclose(out[:, 1], single, atol=1e-4)


def test_stats_pool_zero_weights_finite():
    seq = jnp.ones((1, 4, 10))
    w = jnp.zeros((1, 10))
    out = np.asarray(stats_pool(seq, w))
    assert np.isfinite(out).all()


def test_stats_pool_reference_fixtures():
    """Exact values from the reference test suite (tests/test_stats_pool.py).

    x: (batch=2, features=2, frames=2); weightless, one-speaker weights,
    frame-count mismatch (nearest interp), and all-zero weights -> zeros.
    """
    x = jnp.asarray([[[2.0, 4.0], [2.0, 4.0]], [[1.0, 1.0], [1.0, 1.0]]])

    out = np.round(np.asarray(stats_pool(x)), 4)
    np.testing.assert_allclose(
        out, atol=1e-6, desired= [[3.0, 3.0, 1.4142, 1.4142], [1.0, 1.0, 0.0, 0.0]])

    w = jnp.asarray([[0.5, 0.01], [0.2, 0.1]])
    out = np.round(np.asarray(stats_pool(x, w)), 4)
    np.testing.assert_allclose(
        out, atol=1e-6, desired= [[2.0392, 2.0392, 1.4142, 1.4142], [1.0, 1.0, 0.0, 0.0]])

    # weights longer than the frame axis: nearest-interpolated down
    x2 = jnp.asarray([[[2.0, 2.0], [2.0, 2.0]], [[1.0, 1.0], [1.0, 1.0]]])
    w3 = jnp.asarray([[0.5, 0.5, 0.0], [0.0, 0.5, 0.5]])
    out = np.round(np.asarray(stats_pool(x2, w3)), 4)
    np.testing.assert_allclose(
        out, atol=1e-6, desired= [[2.0, 2.0, 0.0, 0.0], [1.0, 1.0, 0.0, 0.0]])

    # all-zero weight row collapses to exactly zero (not NaN)
    w0 = jnp.asarray([[0.5, 0.01], [0.0, 0.0]])
    out = np.round(np.asarray(stats_pool(x, w0)), 4)
    np.testing.assert_allclose(
        out, atol=1e-6, desired= [[2.0392, 2.0392, 1.4142, 1.4142], [0.0, 0.0, 0.0, 0.0]])


def test_interpolate_weights():
    w = jnp.asarray([[0.0, 1.0, 2.0, 3.0]])
    out = np.asarray(interpolate_weights(w, 8))
    np.testing.assert_array_equal(out[0], [0, 0, 1, 1, 2, 2, 3, 3])
    down = np.asarray(interpolate_weights(w, 2))
    np.testing.assert_array_equal(down[0], [0, 2])


# ---------------------------------------------------------------- ResNet

def test_wespeaker_resnet34_forward():
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    model = WeSpeakerResNet34()
    model.build()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 1, 32000)).astype(np.float32) * 0.1)
    emb = np.asarray(model(wav))
    assert emb.shape == (2, 256)
    assert np.isfinite(emb).all()
    # frames/embedding split must agree with the fused forward
    frames = model.forward_frames(wav)
    assert frames.shape[0] == 2 and frames.shape[2] == 2560
    emb2 = np.asarray(model.forward_embedding(frames))
    # bf16 trunk: jit vs eager rounding differs slightly
    np.testing.assert_allclose(emb, emb2, atol=0.05)
    # per-speaker masked pooling
    weights = jnp.ones((2, 3, frames.shape[1]))
    emb3 = np.asarray(model.forward_embedding(frames, weights))
    assert emb3.shape == (2, 3, 256)


def test_wespeaker_num_frames():
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    model = WeSpeakerResNet34()
    # 2s @16k -> 198 fbank frames -> ceil(198/8)=25
    assert model.num_frames(32000) == 25


def test_wespeaker_torch_conversion_shapes():
    """Synthesize a torch-layout state dict and convert it."""
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    rng = np.random.default_rng(0)
    state = {}

    def add_conv(name, cout, cin, k=3):
        state[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05

    def add_bn(name, c):
        state[f"{name}.weight"] = np.ones(c, np.float32)
        state[f"{name}.bias"] = np.zeros(c, np.float32)
        state[f"{name}.running_mean"] = np.zeros(c, np.float32)
        state[f"{name}.running_var"] = np.ones(c, np.float32)

    add_conv("resnet.conv1", 32, 1)
    add_bn("resnet.bn1", 32)
    blocks = [(1, 3, 32, 32, 1), (2, 4, 32, 64, 2), (3, 6, 64, 128, 2),
              (4, 3, 128, 256, 2)]
    for stage, n, cin, cout, stride in blocks:
        for i in range(n):
            b_in = cin if i == 0 else cout
            add_conv(f"resnet.layer{stage}.{i}.conv1", cout, b_in)
            add_bn(f"resnet.layer{stage}.{i}.bn1", cout)
            add_conv(f"resnet.layer{stage}.{i}.conv2", cout, cout)
            add_bn(f"resnet.layer{stage}.{i}.bn2", cout)
            if i == 0 and (stride != 1 or b_in != cout):
                add_conv(f"resnet.layer{stage}.{i}.shortcut.0", cout, b_in,
                         k=1)
                add_bn(f"resnet.layer{stage}.{i}.shortcut.1", cout)
    state["resnet.seg_1.weight"] = rng.standard_normal(
        (256, 5120)).astype(np.float32) * 0.01
    state["resnet.seg_1.bias"] = np.zeros(256, np.float32)

    model = WeSpeakerResNet34()
    model.build()
    converted = model.convert_torch_state_dict(state)
    # structural match with the initialized pytree
    import jax
    init_shapes = jax.tree_util.tree_map(lambda x: x.shape, model.params)
    conv_shapes = jax.tree_util.tree_map(lambda x: tuple(x.shape), converted)
    assert init_shapes == conv_shapes
    model.params = jax.tree_util.tree_map(jnp.asarray, converted)
    model._jitted_apply = None
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 1, 16000)).astype(np.float32) * 0.1)
    emb = np.asarray(model(wav))
    assert emb.shape == (1, 256) and np.isfinite(emb).all()
