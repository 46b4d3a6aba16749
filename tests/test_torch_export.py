"""Exporting TPU-trained models to reference-format checkpoints.

The deploy-back story: train here, write a lightning-style
pytorch_model.bin (vendor block included), run on stock pyannote.audio.
Golden-tested both directions: the exported state loads into the torch
replica (numeric forward parity) and back into our own loader
(roundtrip identity).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from test_torch_parity import TorchPyanNet, _sinc_weights_np

from pyannote_audio_tpu.core.model import (Model, Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet


def _trained_like_pyannet(seed=0):
    """A built PyanNet with randomly perturbed ("trained") parameters."""
    model = PyanNet()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2, permutation_invariant=True)
    model.build()
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 200))

    def perturb(x):
        x = jnp.asarray(x)
        return x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype)

    model.params = jax.tree_util.tree_map(perturb, model.params)
    model._jitted_apply = None
    return model


def test_export_reference_checkpoint_roundtrip(tmp_path):
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint

    model = _trained_like_pyannet()
    path = export_reference_checkpoint(model, tmp_path)
    assert path.name == "pytorch_model.bin"
    # the shim modules must not leak into this process
    import sys
    assert "pyannote.audio.core.task" not in sys.modules

    # our own torch loader reads it back identically
    again = Model.from_pretrained(path)
    assert type(again).__name__ == "PyanNet"
    assert again.specifications.classes == model.specifications.classes
    assert again.specifications.powerset
    wav = jnp.asarray(0.1 * np.random.default_rng(0).standard_normal(
        (1, 1, 32000)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(again(wav)),
                               np.asarray(model(wav)), atol=1e-5)


def test_exported_state_runs_on_torch_replica(tmp_path):
    """The exported state dict drives the reference-shaped torch network
    to the same outputs as our model — deployability, not just naming."""
    from pyannote_audio_tpu.models.blocks.sincnet import sinc_filters

    model = _trained_like_pyannet(seed=1)
    state = model.export_torch_state_dict()

    low = state["sincnet.conv1d.0.filterbank.low_hz_"].reshape(-1)
    band = state["sincnet.conv1d.0.filterbank.band_hz_"].reshape(-1)
    kernel = np.asarray(sinc_filters(jnp.asarray(low), jnp.asarray(band),
                                     251, 16000))
    ref = TorchPyanNet(kernel)
    ref.eval()
    # exported keys cover exactly the replica's checkpoint layout
    assert set(ref.reference_state_dict(low, band)) == set(state)
    # checkpoint-name -> replica-attribute renames (the replica flattens
    # the reference's sincnet containers into named submodules)
    renames = {"sincnet.wav_norm1d": "wav_norm",
               "sincnet.norm1d.0": "norm80",
               "sincnet.norm1d.1": "norm60a",
               "sincnet.norm1d.2": "norm60b",
               "sincnet.conv1d.1": "conv1",
               "sincnet.conv1d.2": "conv2",
               "linear.0": "lin1", "linear.1": "lin2"}
    torch_state = {}
    for key, value in state.items():
        if key.endswith(("low_hz_", "band_hz_")):
            continue    # baked into the precomputed sinc kernel
        prefix, _, leaf = key.rpartition(".")
        torch_state[f"{renames.get(prefix, prefix)}.{leaf}"] = \
            torch.from_numpy(value)
    missing, unexpected = ref.load_state_dict(torch_state, strict=False)
    assert not unexpected
    assert missing == ["sinc"]     # the precomputed buffer

    wav = 0.1 * np.random.default_rng(1).standard_normal(
        (1, 1, 32000)).astype(np.float32)
    with torch.no_grad():
        expected = ref(torch.from_numpy(wav)).numpy()
    ours = np.asarray(model(jnp.asarray(wav)))
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_export_requires_converter():
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint

    with pytest.raises(NotImplementedError, match="export_torch"):
        export_reference_checkpoint(SimpleSegmentationModel(), "/tmp/x")


def test_export_wespeaker_state_dict(tmp_path):
    """WeSpeaker export: plain resnet.* state dict that (a) reconverts
    to the identical param pytree and (b) load_state_dict()s into the
    torch trunk replica without shape errors."""
    from test_torch_parity import TorchResNet34Trunk

    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint

    model = WeSpeakerResNet34()
    model.build()
    keys = iter(jax.random.split(jax.random.PRNGKey(7), 500))

    def perturb(x):
        x = jnp.asarray(x)
        return x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype)

    model.params = jax.tree_util.tree_map(perturb, model.params)

    path = export_reference_checkpoint(model, tmp_path)
    loaded = torch.load(path, weights_only=False)
    assert isinstance(loaded, dict) and "state_dict" not in loaded

    # (a) exact reconversion roundtrip
    state_np = {k: v.numpy() if hasattr(v, "numpy") else v
                for k, v in loaded.items()}
    again = model.convert_torch_state_dict(state_np)
    flat_a = jax.tree_util.tree_leaves_with_path(model.params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(again))
    for keypath, value in flat_a:
        np.testing.assert_array_equal(np.asarray(value),
                                      np.asarray(flat_b[keypath]),
                                      err_msg=str(keypath))

    # (b) the torch replica accepts the trunk subset of the layout
    trunk_state = {k[len("resnet."):]: v for k, v in loaded.items()
                   if k.startswith("resnet.") and "seg_1" not in k}
    trunk = TorchResNet34Trunk()
    missing, unexpected = trunk.load_state_dict(trunk_state, strict=False)
    assert not missing and not unexpected


@pytest.mark.parametrize("cls_name", ["XVectorMFCC", "XVectorSincNet"])
def test_export_xvector_roundtrip(tmp_path, cls_name):
    """XVector export reconverts bit-exactly; the lightning vendor
    block carries the right architecture path."""
    import pyannote_audio_tpu.models.embedding.xvector as xv
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint

    model = getattr(xv, cls_name)()
    model.build()
    keys = iter(jax.random.split(jax.random.PRNGKey(3), 500))

    def perturb(x):
        x = jnp.asarray(x)
        return x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype)

    model.params = jax.tree_util.tree_map(perturb, model.params)

    path = export_reference_checkpoint(model, tmp_path / cls_name)
    # raw torch.load resolves the vendor block by the REFERENCE's import
    # path (the point of the export) — shim it like the reference would
    from pyannote_audio_tpu.utils.torch_export import reference_shims
    with reference_shims():
        loaded = torch.load(path, weights_only=False)
    assert loaded["pyannote.audio"]["architecture"] == {
        "module": "pyannote.audio.models.embedding", "class": cls_name}

    state_np = {k: v.numpy() for k, v in loaded["state_dict"].items()}
    again = model.convert_torch_state_dict(state_np)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(again))
    for keypath, value in jax.tree_util.tree_leaves_with_path(model.params):
        np.testing.assert_array_equal(np.asarray(value),
                                      np.asarray(flat_b[keypath]),
                                      err_msg=str(keypath))


def test_export_sseriouss_roundtrip(tmp_path):
    """SSeRiouSS export: torchaudio-layout wav2vec.* + head; reconverts
    through the full converter (exercising the torchaudio->HF key
    normalization inverse and the pos-conv weight-norm refactor)."""
    from pyannote_audio_tpu.models.segmentation.sseriouss import SSeRiouSS
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint, reference_shims

    model = SSeRiouSS(wav2vec={"hidden": 32, "layers": 2, "heads": 4,
                               "ffn": 64, "rel_pos_bias": True},
                      lstm={"hidden_size": 16, "num_layers": 1},
                      linear={"hidden_size": 16, "num_layers": 1})
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=1.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    keys = iter(jax.random.split(jax.random.PRNGKey(5), 1000))

    def perturb(x):
        x = jnp.asarray(x)
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        return x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype)

    model.params = jax.tree_util.tree_map(perturb, model.params)

    path = export_reference_checkpoint(model, tmp_path)
    with reference_shims():
        loaded = torch.load(path, weights_only=False)
    assert loaded["pyannote.audio"]["architecture"]["class"] == "SSeRiouSS"
    # torchaudio nesting present (what the reference stores)
    assert any(k.startswith("wav2vec.encoder.transformer.layers.0.")
               for k in loaded["state_dict"])
    assert any(k.startswith("wav2vec.encoder.feature_projection.")
               for k in loaded["state_dict"])

    state_np = {k: v.numpy() for k, v in loaded["state_dict"].items()}
    again = model.convert_torch_state_dict(state_np)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(again))
    for keypath, value in jax.tree_util.tree_leaves_with_path(model.params):
        np.testing.assert_allclose(
            np.asarray(value), np.asarray(flat_b[keypath]),
            rtol=1e-5, atol=1e-7, err_msg=str(keypath))


def test_export_totatonet_roundtrip(tmp_path):
    """ToTaToNet export: asteroid-layout keys covering exactly the torch
    replica's checkpoint, reconverting bit-exactly (the gLN shapes go
    out in asteroid's (1, C, 1) layout and fold back)."""
    from test_torch_parity import TorchToTaToNet

    from pyannote_audio_tpu.models.separation.totatonet import ToTaToNet
    from pyannote_audio_tpu.utils.torch_export import \
        export_reference_checkpoint, reference_shims

    model = ToTaToNet(
        encoder_decoder={"n_filters": 16, "kernel_size": 32, "stride": 16},
        dprnn={"n_repeats": 2, "bn_chan": 32, "hid_size": 16,
               "chunk_size": 20},
        n_sources=2, use_wavlm=False)
    model.build()
    keys = iter(jax.random.split(jax.random.PRNGKey(11), 500))

    def perturb(x):
        x = jnp.asarray(x)
        return x + 0.01 * jax.random.normal(next(keys), x.shape, x.dtype)

    model.params = jax.tree_util.tree_map(perturb, model.params)

    path = export_reference_checkpoint(model, tmp_path)
    with reference_shims():
        loaded = torch.load(path, weights_only=False)
    assert loaded["pyannote.audio"]["architecture"] == {
        "module": "pyannote.audio.models.separation", "class": "ToTaToNet"}
    state_np = {k: v.numpy() for k, v in loaded["state_dict"].items()}

    # exactly the replica's checkpoint key set for the same config
    replica_keys = set(TorchToTaToNet().reference_state_dict())
    assert set(state_np) == replica_keys

    again = model.convert_torch_state_dict(state_np)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(again))
    for keypath, value in jax.tree_util.tree_leaves_with_path(model.params):
        np.testing.assert_array_equal(np.asarray(value),
                                      np.asarray(flat_b[keypath]),
                                      err_msg=str(keypath))
