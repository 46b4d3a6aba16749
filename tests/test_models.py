"""Model-family tests: XVector, ToTaToNet/DPRNN, SSeRiouSS/SSL."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_xvector_mfcc_forward():
    from pyannote_audio_tpu.models.embedding.xvector import XVectorMFCC
    model = XVectorMFCC()
    model.build()
    wav = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
        (2, 1, 16000)).astype(np.float32))
    emb = np.asarray(model(wav))
    assert emb.shape == (2, 512)
    assert np.isfinite(emb).all()
    # per-speaker masked pooling path
    frames = model.forward_frames(wav)
    w = jnp.ones((2, 3, frames.shape[1]))
    out = np.asarray(model.forward_embedding(frames, w))
    assert out.shape == (2, 3, 512)


def test_mfcc_features_shape():
    from pyannote_audio_tpu.models.embedding.xvector import mfcc_features
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8000)).astype(np.float32))
    out = np.asarray(mfcc_features(wav))
    # torchaudio MFCC framing: center=True, hop 200 -> 1 + 8000 // 200
    assert out.shape == (1, 41, 40)
    assert np.isfinite(out).all()


def test_dprnn_shapes():
    from pyannote_audio_tpu.models.blocks.dprnn import DPRNN
    import jax
    module = DPRNN(in_chan=16, out_chan=16, n_src=2, bn_chan=24,
                   hid_size=24, chunk_size=20, n_repeats=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 130, 16)).astype(np.float32))
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x)
    masks = np.asarray(jax.jit(module.apply)(params, x))
    assert masks.shape == (2, 2, 130, 16)
    assert (masks >= 0).all()  # relu masks


def test_totatonet_forward():
    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet
    model = ToTaToNet(dprnn={"n_repeats": 2, "bn_chan": 32,
                             "hid_size": 32, "chunk_size": 50},
                      encoder_decoder={"n_filters": 16})
    model.build()
    wav = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
        (1, 1, 16000)).astype(np.float32))
    diar, sources = model(wav)
    diar, sources = np.asarray(diar), np.asarray(sources)
    assert diar.shape[0] == 1 and diar.shape[2] == 3
    assert (diar >= 0).all() and (diar <= 1).all()
    assert sources.shape == (1, 16000, 3)
    assert model.num_frames(16000) == diar.shape[1]


def test_totatonet_wavlm_raises():
    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet
    with pytest.raises(NotImplementedError):
        ToTaToNet(use_wavlm=True)


def test_ssl_encoder_tiny():
    from pyannote_audio_tpu.models.blocks.ssl import SSLEncoder
    import jax
    enc = SSLEncoder(hidden=32, layers=2, heads=4, ffn=64,
                     conv_channels=16, rel_pos_bias=True)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 1, 8000)).astype(np.float32))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), wav)
    states = jax.jit(enc.apply)(params, wav)
    assert len(states) == 3  # input + 2 layers
    T = SSLEncoder.num_frames(8000)
    assert states[0].shape == (1, T, 32)
    assert np.isfinite(np.asarray(states[-1])).all()


def test_sseriouss_tiny_forward():
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.sseriouss import SSeRiouSS
    model = SSeRiouSS(wav2vec={"hidden": 32, "layers": 2, "heads": 4,
                               "ffn": 64, "rel_pos_bias": False},
                      lstm={"hidden_size": 16, "num_layers": 1},
                      linear={"hidden_size": 16, "num_layers": 1})
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 1, 16000)).astype(np.float32))
    out = np.asarray(model(wav))
    assert out.shape == (1, model.num_frames(16000), 7)
    # log-softmax output
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-4)


def make_hf_ssl_state(hidden=32, layers=2, ffn=64, seed=0):
    """Synthesize an HF-style wav2vec2 torch state dict (16-ch conv trunk)."""
    rng = np.random.default_rng(seed)
    state = {}
    for i, (k, cin) in enumerate(zip([10, 3, 3, 3, 3, 2, 2],
                                     [1, 16, 16, 16, 16, 16, 16])):
        state[f"feature_extractor.conv_layers.{i}.conv.weight"] = \
            rng.standard_normal((16, cin, k)).astype(np.float32) * 0.05
    state["feature_extractor.conv_layers.0.layer_norm.weight"] = \
        np.ones(16, np.float32)
    state["feature_extractor.conv_layers.0.layer_norm.bias"] = \
        np.zeros(16, np.float32)
    state["feature_projection.layer_norm.weight"] = np.ones(16, np.float32)
    state["feature_projection.layer_norm.bias"] = np.zeros(16, np.float32)
    state["feature_projection.projection.weight"] = \
        rng.standard_normal((hidden, 16)).astype(np.float32) * 0.05
    state["feature_projection.projection.bias"] = \
        np.zeros(hidden, np.float32)
    state["encoder.pos_conv_embed.conv.weight_v"] = \
        rng.standard_normal((hidden, hidden // 16, 128)).astype(
            np.float32) * 0.05
    state["encoder.pos_conv_embed.conv.weight_g"] = \
        np.ones((hidden, 1, 1), np.float32)
    state["encoder.pos_conv_embed.conv.bias"] = np.zeros(hidden, np.float32)
    for i in range(layers):
        b = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            state[f"{b}.attention.{proj}.weight"] = \
                rng.standard_normal((hidden, hidden)).astype(
                    np.float32) * 0.05
            state[f"{b}.attention.{proj}.bias"] = \
                np.zeros(hidden, np.float32)
        state[f"{b}.layer_norm.weight"] = np.ones(hidden, np.float32)
        state[f"{b}.layer_norm.bias"] = np.zeros(hidden, np.float32)
        state[f"{b}.final_layer_norm.weight"] = np.ones(hidden, np.float32)
        state[f"{b}.final_layer_norm.bias"] = np.zeros(hidden, np.float32)
        state[f"{b}.feed_forward.intermediate_dense.weight"] = \
            rng.standard_normal((ffn, hidden)).astype(np.float32) * 0.05
        state[f"{b}.feed_forward.intermediate_dense.bias"] = \
            np.zeros(ffn, np.float32)
        state[f"{b}.feed_forward.output_dense.weight"] = \
            rng.standard_normal((hidden, ffn)).astype(np.float32) * 0.05
        state[f"{b}.feed_forward.output_dense.bias"] = \
            np.zeros(hidden, np.float32)
    state["encoder.layer_norm.weight"] = np.ones(hidden, np.float32)
    state["encoder.layer_norm.bias"] = np.zeros(hidden, np.float32)
    return state


def test_ssl_torch_conversion_roundtrip():
    """Synthesize an HF-style torch state dict; convert; run."""
    import jax
    from pyannote_audio_tpu.models.blocks.ssl import (SSLEncoder,
                                                      convert_torch_wav2vec2)
    rng = np.random.default_rng(0)
    hidden, layers, ffn = 32, 2, 64
    state = make_hf_ssl_state(hidden, layers, ffn)

    converted = convert_torch_wav2vec2(state, layers=layers)
    enc = SSLEncoder(hidden=hidden, layers=layers, heads=4, ffn=ffn,
                     conv_channels=16, rel_pos_bias=False)
    wav = jnp.asarray(rng.standard_normal((1, 8000)).astype(np.float32))
    init = jax.jit(enc.init)(jax.random.PRNGKey(0), wav)
    shapes_init = jax.tree_util.tree_map(lambda x: x.shape,
                                         init["params"])
    shapes_conv = jax.tree_util.tree_map(lambda x: tuple(x.shape),
                                         converted)
    assert shapes_init == shapes_conv
    out = jax.jit(enc.apply)({"params": converted}, wav)
    assert np.isfinite(np.asarray(out[-1])).all()


def test_sseriouss_local_wav2vec_checkpoint(tmp_path):
    """SSeRiouSS(wav2vec=<local torch path>) infers dims and loads the
    trunk (reference accepts self-supervised checkpoint paths,
    SSeRiouSS.py:96-123)."""
    import torch
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.sseriouss import SSeRiouSS

    state = make_hf_ssl_state(hidden=32, layers=2, ffn=64)
    ckpt = tmp_path / "wavlm" / "pytorch_model.bin"
    ckpt.parent.mkdir()
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)

    model = SSeRiouSS(wav2vec=str(ckpt.parent),
                      lstm={"hidden_size": 16, "num_layers": 1},
                      linear={"hidden_size": 16, "num_layers": 1})
    assert model.ssl_config["hidden"] == 32
    assert model.ssl_config["layers"] == 2
    assert model.ssl_config["conv_channels"] == 16
    assert model.ssl_config["rel_pos_bias"] is False
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0,
        classes=["a", "b"], powerset_max_classes=1)
    model.build()
    # trunk weights actually grafted: projection kernel matches torch
    proj = np.asarray(
        model.params["params"]["wav2vec"]["feature_projection"]["kernel"])
    np.testing.assert_allclose(
        proj, state["feature_projection.projection.weight"].T, atol=1e-6)
    out = np.asarray(model(np.zeros((1, 1, 16000), np.float32)))
    assert np.isfinite(out).all()

    with pytest.raises(ValueError):
        SSeRiouSS(wav2vec="NOT_A_BUNDLE_OR_PATH")


def test_totatonet_local_wavlm_branch(tmp_path):
    """ToTaToNet(use_wavlm=<path>) concatenates upsampled SSL features
    before the masker (reference ToTaToNet.py:179-196, 331-339)."""
    import torch
    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet

    state = make_hf_ssl_state(hidden=32, layers=2, ffn=64)
    ckpt = tmp_path / "wavlm.bin"
    torch.save({k: torch.from_numpy(v) for k, v in state.items()}, ckpt)

    model = ToTaToNet(use_wavlm=str(ckpt), wavlm_frozen=True,
                      dprnn={"n_repeats": 1, "bn_chan": 16,
                             "hid_size": 16, "chunk_size": 20},
                      linear={"hidden_size": 8, "num_layers": 1})
    assert model.wavlm_config["hidden"] == 32
    assert model.frozen_mask_prefixes() == ["wavlm"]
    model.build()
    wav = np.zeros((1, 1, 16000), np.float32)
    diar, sources = model(wav)
    assert np.asarray(diar).shape[-1] == 3
    assert np.asarray(sources).shape == (1, 16000, 3)
    assert np.isfinite(np.asarray(diar)).all()
    # trunk grafted: projection kernel matches torch weights
    proj = np.asarray(
        model.params["params"]["wavlm"]["feature_projection"]["kernel"])
    np.testing.assert_allclose(
        proj, state["feature_projection.projection.weight"].T, atol=1e-6)

    with pytest.raises(NotImplementedError):
        ToTaToNet(use_wavlm=True)
