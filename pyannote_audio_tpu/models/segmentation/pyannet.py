"""PyanNet: SincNet -> BiLSTM -> feed-forward -> classifier.

TPU-native rebuild of the reference's flagship segmentation architecture
(/root/reference/src/pyannote/audio/models/segmentation/PyanNet.py):
SincNet front-end (stride 10), monolithic 2-layer BiLSTM(128), two
Linear(128) layers with leaky-relu, then a task-dependent classifier head
with log-softmax (powerset) or sigmoid activation.

The whole forward is one jit-compiled function; the LSTM input projections
are hoisted into batched MXU matmuls (ops/lstm.py).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Specifications
from ...utils.params import merge_dict
from ..blocks.rnn import LSTM
from ..blocks.sincnet import SincNet


def convert_sincnet_state_dict(state: Dict[str, np.ndarray],
                               prefix: str = "sincnet") -> Dict:
    """Map the reference's ``sincnet.*`` state-dict keys onto our SincNet
    param subtree (shared by PyanNet and XVectorSincNet — the reference
    instantiates the identical block in both, PyanNet.py:100 /
    xvector.py:233)."""

    def get(*names):
        for n in names:
            if n in state:
                return np.asarray(state[n], dtype=np.float32)
        raise KeyError(f"missing key (tried {names})")

    sn: Dict = {}
    sn["wav_norm1d"] = {"scale": get(f"{prefix}.wav_norm1d.weight"),
                        "bias": get(f"{prefix}.wav_norm1d.bias")}
    sn["sinc_conv"] = {
        "low_hz": get(f"{prefix}.conv1d.0.filterbank.low_hz_",
                      f"{prefix}.conv1d.0.low_hz_").reshape(-1),
        "band_hz": get(f"{prefix}.conv1d.0.filterbank.band_hz_",
                       f"{prefix}.conv1d.0.band_hz_").reshape(-1),
    }
    for i in (0, 1, 2):
        sn[f"norm1d_{i}"] = {
            "scale": get(f"{prefix}.norm1d.{i}.weight"),
            "bias": get(f"{prefix}.norm1d.{i}.bias")}
    for i in (1, 2):
        # torch conv weight (out, in, k) -> flax kernel (k, in, out)
        sn[f"conv1d_{i}"] = {
            "kernel": get(f"{prefix}.conv1d.{i}.weight").transpose(
                2, 1, 0),
            "bias": get(f"{prefix}.conv1d.{i}.bias")}
    return sn


def export_sincnet_state_dict(sn: Dict, prefix: str = "sincnet"
                              ) -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_sincnet_state_dict`: our SincNet param
    subtree -> reference ``sincnet.*`` state-dict keys (low/band in the
    reference's (filters, 1) layout)."""
    a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
    state = {
        f"{prefix}.wav_norm1d.weight": a(sn["wav_norm1d"]["scale"]),
        f"{prefix}.wav_norm1d.bias": a(sn["wav_norm1d"]["bias"]),
        f"{prefix}.conv1d.0.filterbank.low_hz_":
            a(sn["sinc_conv"]["low_hz"]).reshape(-1, 1),
        f"{prefix}.conv1d.0.filterbank.band_hz_":
            a(sn["sinc_conv"]["band_hz"]).reshape(-1, 1),
    }
    for i in (0, 1, 2):
        state[f"{prefix}.norm1d.{i}.weight"] = a(sn[f"norm1d_{i}"]["scale"])
        state[f"{prefix}.norm1d.{i}.bias"] = a(sn[f"norm1d_{i}"]["bias"])
    for i in (1, 2):
        # flax kernel (k, in, out) -> torch conv weight (out, in, k)
        state[f"{prefix}.conv1d.{i}.weight"] = \
            a(sn[f"conv1d_{i}"]["kernel"]).transpose(2, 1, 0)
        state[f"{prefix}.conv1d.{i}.bias"] = a(sn[f"conv1d_{i}"]["bias"])
    return state


class PyanNetModule(nn.Module):
    sincnet_stride: int = 10
    sample_rate: int = 16000
    lstm_hidden: int = 128
    lstm_layers: int = 2
    bidirectional: bool = True
    linear_hidden: int = 128
    linear_layers: int = 2
    dimension: int = 7
    activation: str = "log_softmax"

    # Inference.slide may compute the sinc conv ONCE per file and gather
    # per-chunk frames (see SincNet.from_conv) instead of re-convolving
    # every 90%-overlapping chunk.
    FRONTEND_SHARED = True

    def setup(self):
        self.sincnet = SincNet(stride=self.sincnet_stride,
                               sample_rate=self.sample_rate)
        self.lstm = LSTM(hidden_size=self.lstm_hidden,
                         num_layers=self.lstm_layers,
                         bidirectional=self.bidirectional)
        for i in range(self.linear_layers):
            setattr(self, f"linear_{i}", nn.Dense(self.linear_hidden))
        self.classifier = nn.Dense(self.dimension)

    def _head(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.lstm(x)
        for i in range(self.linear_layers):
            x = nn.leaky_relu(getattr(self, f"linear_{i}")(x), 0.01)
        x = self.classifier(x)
        if self.activation == "log_softmax":
            return nn.log_softmax(x, axis=-1)
        if self.activation == "sigmoid":
            return nn.sigmoid(x)
        if self.activation == "softmax":
            return nn.softmax(x, axis=-1)
        raise ValueError(f"unknown activation {self.activation}")

    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        return self._head(self.sincnet(waveforms))

    # -- shared front-end protocol (duck-typed by Inference.slide) ---------

    @property
    def frontend_stride(self) -> int:
        return self.sincnet_stride

    def frontend_num_frames(self, window_samples: int) -> int:
        """Sinc-conv output frames for one chunk (static python int)."""
        from ...utils.receptive_field import conv1d_num_frames
        from ..blocks.sincnet import SINC_KERNEL_SIZE
        return conv1d_num_frames(window_samples,
                                 kernel_size=SINC_KERNEL_SIZE,
                                 stride=self.sincnet_stride)

    def precompute_frontend(self, waveform: jnp.ndarray) -> jnp.ndarray:
        """Whole-file raw sinc conv: (C=1, T) -> (1, F_all, n_filters)."""
        return self.sincnet.whole_conv(waveform[:, :, None])

    def forward_from_frontend(self, frames: jnp.ndarray, mean: jnp.ndarray,
                              var: jnp.ndarray) -> jnp.ndarray:
        """Forward from gathered conv frames + per-chunk raw stats."""
        return self._head(self.sincnet.from_conv(frames, mean, var))


class PyanNet(Model):
    """Parity: PyanNet (reference PyanNet.py:38-240)."""

    SINCNET_DEFAULTS = {"stride": 10}
    LSTM_DEFAULTS = {"hidden_size": 128, "num_layers": 2,
                     "bidirectional": True, "monolithic": True,
                     "dropout": 0.0}
    LINEAR_DEFAULTS = {"hidden_size": 128, "num_layers": 2}

    def __init__(
        self,
        sincnet: Optional[dict] = None,
        lstm: Optional[dict] = None,
        linear: Optional[dict] = None,
        sample_rate: int = 16000,
        num_channels: int = 1,
        task=None,
        **kwargs,
    ):
        super().__init__(sample_rate=sample_rate, num_channels=num_channels,
                         task=task)
        self.sincnet = merge_dict(self.SINCNET_DEFAULTS, sincnet)
        self.lstm = merge_dict(self.LSTM_DEFAULTS, lstm)
        self.linear = merge_dict(self.LINEAR_DEFAULTS, linear)
        self.lstm.pop("batch_first", None)
        self.hparams = {"sincnet": self.sincnet, "lstm": self.lstm,
                        "linear": self.linear}

    def _activation_name(self) -> str:
        specs = self.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        if spec.problem == Problem.MONO_LABEL_CLASSIFICATION:
            return "log_softmax"
        return "sigmoid"

    def build_module(self) -> nn.Module:
        return PyanNetModule(
            sincnet_stride=self.sincnet["stride"],
            sample_rate=self.sample_rate,
            lstm_hidden=self.lstm["hidden_size"],
            lstm_layers=self.lstm["num_layers"],
            bidirectional=self.lstm["bidirectional"],
            linear_hidden=self.linear["hidden_size"],
            linear_layers=self.linear["num_layers"],
            dimension=self.dimension,
            activation=self._activation_name(),
        )

    # -- frame math --------------------------------------------------------

    def num_frames(self, num_samples: int) -> int:
        return SincNet.num_frames(num_samples, stride=self.sincnet["stride"])

    def receptive_field_size(self, num_frames: int = 1) -> int:
        return SincNet.receptive_field_size(
            num_frames, stride=self.sincnet["stride"])

    def receptive_field_center(self, frame: int = 0) -> int:
        return SincNet.receptive_field_center(
            frame, stride=self.sincnet["stride"])

    # -- torch checkpoint conversion --------------------------------------

    def convert_torch_state_dict(self, state: Dict[str, np.ndarray]):
        """Map a reference PyanNet state_dict onto our param pytree."""
        p: Dict = {"lstm": {}, "classifier": {}}

        def get(*names):
            for n in names:
                if n in state:
                    return np.asarray(state[n], dtype=np.float32)
            raise KeyError(f"missing key (tried {names})")

        p["sincnet"] = convert_sincnet_state_dict(state)

        for i in range(self.lstm["num_layers"]):
            for suffix, ours in (("", ""), ("_reverse", "_reverse")):
                if suffix and not self.lstm["bidirectional"]:
                    continue
                for kind in ("w_ih", "w_hh", "b_ih", "b_hh"):
                    torch_kind = kind.replace("w_", "weight_").replace(
                        "b_", "bias_")
                    # monolithic nn.LSTM keys, else the per-layer
                    # nn.ModuleList layout of lstm["monolithic"]=False
                    # (reference PyanNet.py:95-120) — identical math at
                    # inference (dropout only acts between layers in
                    # training)
                    p["lstm"][f"{kind}_l{i}{ours}"] = get(
                        f"lstm.{torch_kind}_l{i}{suffix}",
                        f"lstm.{i}.{torch_kind}_l0{suffix}")

        for i in range(self.linear["num_layers"]):
            p[f"linear_{i}"] = {
                "kernel": get(f"linear.{i}.weight").T,
                "bias": get(f"linear.{i}.bias")}
        p["classifier"] = {"kernel": get("classifier.weight").T,
                           "bias": get("classifier.bias")}
        return {"params": p}

    #: reference import path for exported checkpoints
    REFERENCE_ARCHITECTURE = ("pyannote.audio.models.segmentation",
                              "PyanNet")

    def export_torch_state_dict(self) -> Dict[str, np.ndarray]:
        """Inverse of :meth:`convert_torch_state_dict`: our param pytree
        -> a reference-layout PyanNet state dict (deploy a TPU-trained
        model on the stock pyannote.audio stack)."""
        if self.params is None:
            raise ValueError("build or load the model before exporting")
        p = self.params["params"]
        a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
        state = export_sincnet_state_dict(p["sincnet"])
        for i in range(self.lstm["num_layers"]):
            for suffix in ("", "_reverse"):
                if suffix and not self.lstm["bidirectional"]:
                    continue
                for kind in ("w_ih", "w_hh", "b_ih", "b_hh"):
                    torch_kind = kind.replace("w_", "weight_").replace(
                        "b_", "bias_")
                    state[f"lstm.{torch_kind}_l{i}{suffix}"] = a(
                        p["lstm"][f"{kind}_l{i}{suffix}"])
        for i in range(self.linear["num_layers"]):
            state[f"linear.{i}.weight"] = a(p[f"linear_{i}"]["kernel"]).T
            state[f"linear.{i}.bias"] = a(p[f"linear_{i}"]["bias"])
        state["classifier.weight"] = a(p["classifier"]["kernel"]).T
        state["classifier.bias"] = a(p["classifier"]["bias"])
        return state

    def export_torch_hparams(self) -> Dict:
        """hyper_parameters block for exported reference checkpoints
        (restores the torch-only lstm keys our constructor drops)."""
        lstm = dict(self.lstm)
        lstm.setdefault("monolithic", True)
        lstm.setdefault("dropout", 0.0)
        lstm["batch_first"] = True
        return {"sincnet": dict(self.sincnet), "lstm": lstm,
                "linear": dict(self.linear),
                "sample_rate": self.sample_rate,
                "num_channels": self.num_channels}
