"""Loading untouched reference-style checkpoints (pytorch_model.bin).

Builds a lightning-style checkpoint exactly as the reference writes it —
including the pickled ``pyannote.audio`` vendor block (fake modules stand
in for the reference package during pickling) — and loads it through
``Model.from_pretrained``.
"""

import sys
import types
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import List, Optional, Text, Tuple

import numpy as np
import pytest
import torch

import jax.numpy as jnp


def _install_fake_reference_modules():
    """Create pyannote.audio.core.task with reference-shaped classes."""

    class Problem(Enum):
        BINARY_CLASSIFICATION = 0
        MONO_LABEL_CLASSIFICATION = 1
        MULTI_LABEL_CLASSIFICATION = 2
        REPRESENTATION = 3
        REGRESSION = 4

    class Resolution(Enum):
        FRAME = 1
        CHUNK = 2

    @dataclass
    class Specifications:
        problem: Problem
        resolution: Resolution
        duration: float
        min_duration: Optional[float] = None
        warm_up: Optional[Tuple[float, float]] = (0.0, 0.0)
        classes: Optional[List[Text]] = None
        powerset_max_classes: Optional[int] = None
        permutation_invariant: bool = False

    created = []
    for name in ("pyannote", "pyannote.audio", "pyannote.audio.core",
                 "pyannote.audio.core.task"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
            created.append(name)
    mod = sys.modules["pyannote.audio.core.task"]
    for klass in (Problem, Resolution, Specifications):
        klass.__module__ = "pyannote.audio.core.task"
        klass.__qualname__ = klass.__name__
        setattr(mod, klass.__name__, klass)
    return created, Specifications, Problem, Resolution


def test_load_reference_style_checkpoint(tmp_path):
    from test_torch_parity import TorchPyanNet, _sinc_weights_np
    from pyannote_audio_tpu.core.model import Model

    created, Spec, Problem, Resolution = _install_fake_reference_modules()
    try:
        torch.manual_seed(0)
        low, band, sinc_kernel = _sinc_weights_np()
        ref = TorchPyanNet(sinc_kernel)
        ref.eval()
        state = ref.reference_state_dict(low, band)
        specs = Spec(
            problem=Problem.MONO_LABEL_CLASSIFICATION,
            resolution=Resolution.FRAME, duration=2.0,
            classes=["speaker#1", "speaker#2", "speaker#3"],
            powerset_max_classes=2, permutation_invariant=True)
        ckpt = {
            "state_dict": {k: torch.from_numpy(np.asarray(v))
                           for k, v in state.items()},
            "hyper_parameters": {
                "sincnet": {"stride": 10},
                "lstm": {"hidden_size": 128, "num_layers": 2,
                         "bidirectional": True, "monolithic": True,
                         "dropout": 0.0, "batch_first": True},
                "linear": {"hidden_size": 128, "num_layers": 2},
            },
            "pyannote.audio": {
                "architecture": {
                    "module": "pyannote.audio.models.segmentation",
                    "class": "PyanNet",
                },
                "specifications": specs,
            },
        }
        path = tmp_path / "pytorch_model.bin"
        torch.save(ckpt, path)
    finally:
        for name in created:
            del sys.modules[name]

    # the reference package is gone now; loading must still work
    model = Model.from_pretrained(path)
    assert type(model).__name__ == "PyanNet"
    assert model.specifications.powerset
    assert model.specifications.classes == ["speaker#1", "speaker#2",
                                            "speaker#3"]

    wav = torch.randn(1, 1, 32000) * 0.1
    with torch.no_grad():
        expected = ref(wav).numpy()
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    np.testing.assert_allclose(ours, expected, atol=2e-4)


def test_load_reference_sseriouss_checkpoint(tmp_path):
    """A reference-style SSeRiouSS checkpoint (torchaudio wav2vec2_model
    hparams dict + torchaudio key layout) loads through
    Model.from_pretrained and matches the torch composition."""
    import torch.nn as tnn
    import torch.nn.functional as F
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from test_torch_parity import _TINY
    from pyannote_audio_tpu.core.model import Model

    created, Spec, Problem, Resolution = _install_fake_reference_modules()
    try:
        torch.manual_seed(10)
        hf = Wav2Vec2Model(Wav2Vec2Config(do_stable_layer_norm=False,
                                          feat_extract_norm="group",
                                          **_TINY))
        hf.eval()
        lstm = tnn.LSTM(64, 16, num_layers=1, batch_first=True,
                        bidirectional=True)
        lin0 = tnn.Linear(32, 24)
        classifier = tnn.Linear(24, 7)

        state = {}
        for k, v in hf.state_dict().items():
            if k.startswith("encoder."):
                k = "encoder.transformer." + k[len("encoder."):]
            if k.startswith("feature_projection."):
                k = "encoder." + k
            state[f"wav2vec.{k}"] = v
        state["wav2vec_weights"] = torch.ones(2)
        for kind in ("weight_ih", "weight_hh", "bias_ih", "bias_hh"):
            state[f"lstm.{kind}_l0"] = getattr(lstm, f"{kind}_l0")
            state[f"lstm.{kind}_l0_reverse"] = getattr(
                lstm, f"{kind}_l0_reverse")
        state["linear.0.weight"] = lin0.weight
        state["linear.0.bias"] = lin0.bias
        state["classifier.weight"] = classifier.weight
        state["classifier.bias"] = classifier.bias

        specs = Spec(
            problem=Problem.MONO_LABEL_CLASSIFICATION,
            resolution=Resolution.FRAME, duration=2.0,
            classes=["speaker#1", "speaker#2", "speaker#3"],
            powerset_max_classes=2, permutation_invariant=True)
        ckpt = {
            "state_dict": {k: v.detach() for k, v in state.items()},
            "hyper_parameters": {
                # torchaudio wav2vec2_model kwargs, as the reference
                # persists them (SSeRiouSS.py:118-123)
                "wav2vec": {
                    "extractor_mode": "group_norm",
                    "extractor_conv_layer_config": [
                        [32, 10, 5], [32, 3, 2], [32, 3, 2], [32, 3, 2],
                        [32, 3, 2], [32, 2, 2], [32, 2, 2]],
                    "extractor_conv_bias": False,
                    "encoder_embed_dim": 64,
                    "encoder_num_layers": 2,
                    "encoder_num_heads": 4,
                    "encoder_ff_interm_features": 128,
                    "encoder_layer_norm_first": False,
                },
                "wav2vec_layer": -1,
                "lstm": {"hidden_size": 16, "num_layers": 1,
                         "bidirectional": True, "monolithic": True,
                         "dropout": 0.0, "batch_first": True},
                "linear": {"hidden_size": 24, "num_layers": 1},
            },
            "pyannote.audio": {
                "architecture": {
                    "module": "pyannote.audio.models.segmentation",
                    "class": "SSeRiouSS",
                },
                "specifications": specs,
            },
        }
        path = tmp_path / "pytorch_model.bin"
        torch.save(ckpt, path)

        wav = torch.randn(1, 1, 16000) * 0.1
        with torch.no_grad():
            hs = hf(wav[:, 0], output_hidden_states=True).hidden_states
            x = torch.stack(hs[1:], dim=-1).mean(-1)
            x, _ = lstm(x)
            x = F.leaky_relu(lin0(x))
            expected = F.log_softmax(classifier(x), dim=-1).numpy()
    finally:
        for name in created:
            del sys.modules[name]

    model = Model.from_pretrained(path)
    assert type(model).__name__ == "SSeRiouSS"
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=5e-4)


def test_load_reference_snapshot_directory(tmp_path):
    """A directory holding only pytorch_model.bin loads transparently."""
    from test_torch_parity import TorchPyanNet, _sinc_weights_np
    from pyannote_audio_tpu.core.model import Model

    created, Spec, Problem, Resolution = _install_fake_reference_modules()
    try:
        low, band, sinc_kernel = _sinc_weights_np()
        ref = TorchPyanNet(sinc_kernel)
        specs = Spec(problem=Problem.MONO_LABEL_CLASSIFICATION,
                     resolution=Resolution.FRAME, duration=2.0,
                     classes=["a", "b", "c"], powerset_max_classes=2)
        ckpt = {
            "state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in
                           ref.reference_state_dict(low, band).items()},
            "hyper_parameters": {},
            "pyannote.audio": {
                "architecture": {"module": "x", "class": "PyanNet"},
                "specifications": specs,
            },
        }
        snapshot = tmp_path / "segmentation"
        snapshot.mkdir()
        torch.save(ckpt, snapshot / "pytorch_model.bin")
    finally:
        for name in created:
            del sys.modules[name]

    model = Model.from_pretrained(snapshot)
    assert model.dimension == 7


def test_load_reference_checkpoint_from_hub_id(tmp_path, monkeypatch):
    """A hub repo holding ONLY pytorch_model.bin (what the reference
    publishes) downloads and converts via Model.from_pretrained(hub id):
    the torch-asset fallback of the hub resolution path."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from test_torch_parity import TorchPyanNet, _sinc_weights_np
    from pyannote_audio_tpu.core.model import Model

    created, Spec, Problem, Resolution = _install_fake_reference_modules()
    try:
        torch.manual_seed(0)
        low, band, sinc_kernel = _sinc_weights_np()
        ref = TorchPyanNet(sinc_kernel)
        ref.eval()
        state = ref.reference_state_dict(low, band)
        specs = Spec(
            problem=Problem.MONO_LABEL_CLASSIFICATION,
            resolution=Resolution.FRAME, duration=2.0,
            classes=["speaker#1", "speaker#2", "speaker#3"],
            powerset_max_classes=2, permutation_invariant=True)
        ckpt = {
            "state_dict": {k: torch.from_numpy(np.asarray(v))
                           for k, v in state.items()},
            "hyper_parameters": {
                "sincnet": {"stride": 10},
                "lstm": {"hidden_size": 128, "num_layers": 2,
                         "bidirectional": True, "monolithic": True,
                         "dropout": 0.0, "batch_first": True},
                "linear": {"hidden_size": 128, "num_layers": 2},
            },
            "pyannote.audio": {
                "architecture": {
                    "module": "pyannote.audio.models.segmentation",
                    "class": "PyanNet",
                },
                "specifications": specs,
            },
        }
        torch.save(ckpt, tmp_path / "pytorch_model.bin")
    finally:
        for name in created:
            del sys.modules[name]
    payload = (tmp_path / "pytorch_model.bin").read_bytes()

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/acme/torch-seg/resolve/main/pytorch_model.bin":
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:   # no params.msgpack / config.yaml in the repo
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

        def log_message(self, *args):
            pass

    server = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        monkeypatch.setenv(
            "HF_ENDPOINT",
            f"http://127.0.0.1:{server.server_address[1]}")
        monkeypatch.setenv("PYANNOTE_TPU_HUB", "")
        monkeypatch.setenv("PYANNOTE_TPU_CACHE", str(tmp_path / "cache"))

        model = Model.from_pretrained("acme/torch-seg")
    finally:
        server.shutdown()
    assert type(model).__name__ == "PyanNet"
    wav = torch.randn(1, 1, 32000) * 0.1
    with torch.no_grad():
        expected = ref(wav).numpy()
    ours = np.asarray(model(jnp.asarray(wav.numpy())))
    np.testing.assert_allclose(ours, expected, atol=2e-4)
