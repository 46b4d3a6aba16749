"""ONNX WeSpeaker backend: dependency-free weight extraction into the
native ResNet (VERDICT round-2 item 7: factory parity + ONNX->native
weight conversion)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_onnx_roundtrip(tmp_path):
    from pyannote_audio_tpu.utils.onnx import (read_onnx_initializers,
                                               write_onnx_initializers)
    weights = {
        "conv1.weight": np.random.default_rng(0).normal(
            size=(8, 1, 3, 3)).astype(np.float32),
        "bn1.running_mean": np.zeros(8, np.float32),
        "ids": np.arange(5, dtype=np.int64),
    }
    path = tmp_path / "w.onnx"
    write_onnx_initializers(path, weights)
    back = read_onnx_initializers(path)
    assert set(back) == set(weights)
    for k in weights:
        np.testing.assert_array_equal(back[k], weights[k])
        assert back[k].dtype == weights[k].dtype


def _resnet34_state(seed=0, m=32, emb=256):
    """Random reference-shaped WeSpeaker ResNet34 weights (bare module
    names, as torch.onnx.export emits them)."""
    rng = np.random.default_rng(seed)

    def conv(cout, cin, k):
        return (rng.normal(size=(cout, cin, k, k)) * 0.05).astype(
            np.float32)

    def bn(c):
        return {"weight": rng.uniform(0.5, 1.5, c).astype(np.float32),
                "bias": rng.uniform(-0.2, 0.2, c).astype(np.float32),
                "running_mean": rng.uniform(-0.3, 0.3, c).astype(
                    np.float32),
                "running_var": rng.uniform(0.5, 1.5, c).astype(
                    np.float32)}

    state = {"conv1.weight": conv(m, 1, 3)}
    for k, v in bn(m).items():
        state[f"bn1.{k}"] = v
    cin = m
    for stage, (mult, n, stride) in enumerate(
            ((1, 3, 1), (2, 4, 2), (4, 6, 2), (8, 3, 2)), start=1):
        cout = m * mult
        for i in range(n):
            p = f"layer{stage}.{i}"
            state[f"{p}.conv1.weight"] = conv(cout, cin, 3)
            state[f"{p}.conv2.weight"] = conv(cout, cout, 3)
            for k, v in bn(cout).items():
                state[f"{p}.bn1.{k}"] = v
            for k, v in bn(cout).items():
                state[f"{p}.bn2.{k}"] = v
            if i == 0 and (stride != 1 or cin != cout):
                state[f"{p}.shortcut.0.weight"] = conv(cout, cin, 1)
                for k, v in bn(cout).items():
                    state[f"{p}.shortcut.1.{k}"] = v
            cin = cout
    stats = (80 // 8) * m * 8 * 2
    state["seg_1.weight"] = (rng.normal(size=(emb, stats)) * 0.02).astype(
        np.float32)
    state["seg_1.bias"] = np.zeros(emb, np.float32)
    return state


def test_onnx_wespeaker_loads_native_resnet(tmp_path):
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.pipelines.speaker_verification import \
        PretrainedSpeakerEmbedding
    from pyannote_audio_tpu.utils.onnx import write_onnx_initializers

    state = _resnet34_state()
    path = tmp_path / "wespeaker-voxceleb-resnet34-LM.onnx"
    write_onnx_initializers(path, state)

    backend = PretrainedSpeakerEmbedding(str(path))
    assert backend.dimension == 256
    wav = (0.1 * np.random.default_rng(1).standard_normal(
        (2, 1, 16000))).astype(np.float32)
    emb = backend(wav)
    assert emb.shape == (2, 256)
    assert np.isfinite(emb).all()

    # identical to converting the reference-layout torch state directly
    direct = WeSpeakerResNet34()
    direct.build()
    direct.params = direct.convert_torch_state_dict(
        {f"resnet.{k}": v for k, v in state.items()})
    direct._jitted_apply = None
    np.testing.assert_allclose(np.asarray(direct(wav)), emb, atol=1e-5)


def test_factory_dispatch_shapes(tmp_path):
    from pyannote_audio_tpu.pipelines.speaker_verification import \
        PretrainedSpeakerEmbedding

    # speechbrain ids dispatch to the NATIVE ECAPA backend, which fails
    # with an actionable checkpoint-resolution error when the snapshot
    # is neither local nor downloadable (no egress in CI)
    with pytest.raises((FileNotFoundError, OSError),
                       match="spkrec-ecapa-voxceleb"):
        PretrainedSpeakerEmbedding("speechbrain/spkrec-ecapa-voxceleb")
    with pytest.raises((FileNotFoundError, OSError), match="titanet"):
        PretrainedSpeakerEmbedding("nvidia/speakerverification_en_titanet_large")
    with pytest.raises(ValueError, match="not a local file"):
        PretrainedSpeakerEmbedding("wespeaker/wespeaker-voxceleb-resnet34-LM")
