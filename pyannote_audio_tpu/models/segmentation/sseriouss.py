"""SSeRiouSS: SSL front-end -> LSTM -> linear -> classifier.

Parity: /root/reference/src/pyannote/audio/models/segmentation/
SSeRiouSS.py: a wav2vec2/WavLM trunk (torchaudio bundle in the reference;
our native flax SSLEncoder), learnable layer-weight averaging when
``wav2vec_layer < 0`` (:125-128), optional trunk freezing (:130-131),
then the PyanNet-style BiLSTM + linear + classifier head.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Specifications
from ...utils.params import merge_dict
from ..blocks.rnn import LSTM
from ..blocks.ssl import SSLEncoder, convert_torch_wav2vec2

_SSL_CONFIGS = {
    # torchaudio-bundle-style names the reference accepts. pre_ln mirrors
    # HF do_stable_layer_norm, conv_norm feat_extract_norm: BASE models
    # (and wav2vec2-large-960h) are post-norm with a group-norm trunk;
    # WavLM-large is pre-norm with a layer-norm trunk.
    "WAV2VEC2_BASE": dict(hidden=768, layers=12, heads=12, ffn=3072,
                          rel_pos_bias=False, pre_ln=False,
                          conv_norm="group"),
    "WAV2VEC2_LARGE": dict(hidden=1024, layers=24, heads=16, ffn=4096,
                           rel_pos_bias=False, pre_ln=False,
                           conv_norm="group"),
    "WAVLM_BASE": dict(hidden=768, layers=12, heads=12, ffn=3072,
                       rel_pos_bias=True, pre_ln=False,
                       conv_norm="group"),
    "WAVLM_BASE_PLUS": dict(hidden=768, layers=12, heads=12, ffn=3072,
                            rel_pos_bias=True, pre_ln=False,
                            conv_norm="group"),
    "WAVLM_LARGE": dict(hidden=1024, layers=24, heads=16, ffn=4096,
                        rel_pos_bias=True, pre_ln=True,
                        conv_norm="layer"),
}


def _load_torch_ssl_state(path) -> Dict[str, np.ndarray]:
    """Load a local torch wav2vec2/WavLM checkpoint into numpy arrays.

    Accepts a .bin/.pt/.ckpt file or a HF snapshot directory containing
    pytorch_model.bin; unwraps common nesting ("state_dict"/"model") and
    strips the HF "wav2vec2." prefix.
    """
    from pathlib import Path
    path = Path(path)
    if path.is_dir():
        for name in ("pytorch_model.bin", "model.pt", "checkpoint.pt"):
            if (path / name).exists():
                path = path / name
                break
        else:
            raise ValueError(f"no torch checkpoint found in {path}")
    import torch
    state = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model"):
        if isinstance(state, dict) and key in state \
                and isinstance(state[key], dict):
            state = state[key]
    out = {}
    for key, value in state.items():
        if not hasattr(value, "numpy"):
            continue
        if key.startswith("wav2vec2."):
            key = key[len("wav2vec2."):]
        out[key] = value.detach().cpu().numpy()
    return out


def _infer_ssl_config(state: Dict[str, np.ndarray]) -> Dict:
    """Infer encoder dims from a wav2vec2/WavLM state dict (HF layout or
    the torchaudio ``wav2vec2_model`` layout the reference's path branch
    loads — SSeRiouSS.py:109-116; keys are normalized to HF first)."""
    from ..blocks.ssl import _normalize_ssl_keys
    state = _normalize_ssl_keys(state)
    hidden = state["feature_projection.projection.weight"].shape[0]
    layers = 1 + max(int(k.split(".")[2]) for k in state
                     if k.startswith("encoder.layers."))
    ffn_keys = [k for k in state
                if "feed_forward.intermediate_dense.weight" in k]
    ffn = state[ffn_keys[0]].shape[0]
    rel_pos_bias = any("rel_attn_embed" in k or "gru_rel_pos" in k
                      for k in state)
    # WavLM states carry the head count explicitly (gru_rel_pos_const is
    # (1, H, 1, 1); rel_attn_embed is (num_buckets, H)); otherwise fall
    # back to the 64-dim-per-head convention of the released models
    heads = None
    for key, value in state.items():
        if key.endswith("gru_rel_pos_const"):
            heads = int(np.asarray(value).shape[1])
            break
        if key.endswith("rel_attn_embed.weight"):
            heads = int(np.asarray(value).shape[-1])
            break
    if heads is None:
        heads = {768: 12, 1024: 16}.get(hidden, max(1, hidden // 64))
    conv_channels = state[
        "feature_extractor.conv_layers.0.conv.weight"].shape[0]
    # feat_extract_norm="layer" (per-conv LayerNorm) pairs with
    # do_stable_layer_norm=True in every released wav2vec2/WavLM model —
    # the state dict carries no direct pre/post-norm marker
    layer_trunk = \
        "feature_extractor.conv_layers.1.layer_norm.weight" in state
    return dict(hidden=hidden, layers=layers, heads=heads, ffn=ffn,
                rel_pos_bias=rel_pos_bias, conv_channels=conv_channels,
                pre_ln=layer_trunk,
                conv_norm="layer" if layer_trunk else "group")


class SSeRiouSSModule(nn.Module):
    ssl_hidden: int = 768
    ssl_layers: int = 12
    ssl_heads: int = 12
    ssl_ffn: int = 3072
    ssl_conv_channels: int = 512
    rel_pos_bias: bool = True
    ssl_pre_ln: bool = False
    ssl_conv_norm: str = "group"
    wav2vec_layer: int = -1
    lstm_hidden: int = 128
    lstm_layers: int = 4
    bidirectional: bool = True
    linear_hidden: int = 128
    linear_layers: int = 2
    dimension: int = 7
    activation: str = "log_softmax"

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        states = SSLEncoder(hidden=self.ssl_hidden, layers=self.ssl_layers,
                            heads=self.ssl_heads, ffn=self.ssl_ffn,
                            conv_channels=self.ssl_conv_channels,
                            rel_pos_bias=self.rel_pos_bias,
                            pre_ln=self.ssl_pre_ln,
                            conv_norm_mode=self.ssl_conv_norm,
                            # torchaudio extract_features parity: RAW
                            # per-layer outputs feed the averaging/head
                            normalize_last=False,
                            name="wav2vec")(waveforms)
        if self.wav2vec_layer < 0:
            # learnable average over the num_layers TRANSFORMER outputs
            # (reference wav2vec_weights has length num_layers,
            # SSeRiouSS.py:125-128 — the embedding state is excluded)
            layer_states = states[1:]
            weights = self.param("layer_weights", nn.initializers.ones,
                                 (len(layer_states),))
            w = jax.nn.softmax(weights)
            x = sum(wi * si for wi, si in zip(w, layer_states))
        else:
            # extract_features(num_layers=k)[-1] == output of layer k-1
            # == states[k] (states[0] is the pre-layer embedding)
            x = states[self.wav2vec_layer]
        x = LSTM(hidden_size=self.lstm_hidden, num_layers=self.lstm_layers,
                 bidirectional=self.bidirectional, name="lstm")(x)
        for i in range(self.linear_layers):
            x = nn.leaky_relu(
                nn.Dense(self.linear_hidden, name=f"linear_{i}")(x), 0.01)
        x = nn.Dense(self.dimension, name="classifier")(x)
        if self.activation == "log_softmax":
            return nn.log_softmax(x, axis=-1)
        return nn.sigmoid(x)


class SSeRiouSS(Model):
    """Parity: SSeRiouSS (reference SSeRiouSS.py:42-328)."""

    WAV2VEC_DEFAULTS = "WAVLM_BASE"
    LSTM_DEFAULTS = {"hidden_size": 128, "num_layers": 4,
                     "bidirectional": True, "monolithic": True,
                     "dropout": 0.0}
    LINEAR_DEFAULTS = {"hidden_size": 128, "num_layers": 2}

    def __init__(self, wav2vec: Union[dict, str, None] = None,
                 wav2vec_layer: int = -1,
                 freeze_wav2vec: bool = False,
                 lstm: Optional[dict] = None,
                 linear: Optional[dict] = None,
                 sample_rate: int = 16000, num_channels: int = 1,
                 task=None, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        if wav2vec is None:
            wav2vec = self.WAV2VEC_DEFAULTS
        self._ssl_state: Optional[Dict[str, np.ndarray]] = None
        if isinstance(wav2vec, str) and wav2vec in _SSL_CONFIGS:
            self.ssl_config = dict(_SSL_CONFIGS[wav2vec])
            self.wav2vec_name = wav2vec
        elif isinstance(wav2vec, str):
            # local torch checkpoint path (parity: the reference accepts a
            # path to a self-supervised checkpoint, SSeRiouSS.py:96-123)
            from pathlib import Path
            path = Path(wav2vec)
            if not path.exists():
                raise ValueError(
                    f"unknown SSL bundle {wav2vec!r}; choose from "
                    f"{sorted(_SSL_CONFIGS)} or pass a local torch "
                    f"wav2vec2/WavLM checkpoint path")
            self._ssl_state = _load_torch_ssl_state(path)
            self.ssl_config = _infer_ssl_config(self._ssl_state)
            self.wav2vec_name = str(wav2vec)
        elif isinstance(wav2vec, dict) and "encoder_embed_dim" in wav2vec:
            # reference checkpoints persist the torchaudio
            # ``wav2vec2_model``/``wavlm_model`` kwargs as hparams
            # (SSeRiouSS.py:118-123); translate them to our config
            conv_cfg = wav2vec.get("extractor_conv_layer_config") or []
            self.ssl_config = dict(
                hidden=wav2vec["encoder_embed_dim"],
                layers=wav2vec["encoder_num_layers"],
                heads=wav2vec["encoder_num_heads"],
                ffn=wav2vec["encoder_ff_interm_features"],
                conv_channels=conv_cfg[0][0] if conv_cfg else 512,
                rel_pos_bias="encoder_num_buckets" in wav2vec,
                pre_ln=wav2vec.get("encoder_layer_norm_first", False),
                conv_norm="layer"
                if wav2vec.get("extractor_mode") == "layer_norm"
                else "group")
            self.wav2vec_name = dict(wav2vec)
        else:
            self.ssl_config = dict(wav2vec)
            self.wav2vec_name = "custom"
        self.wav2vec_layer = wav2vec_layer
        self.freeze_wav2vec = freeze_wav2vec
        self.lstm = merge_dict(self.LSTM_DEFAULTS, lstm)
        self.linear = merge_dict(self.LINEAR_DEFAULTS, linear)
        self.hparams = {"wav2vec": self.wav2vec_name,
                        "wav2vec_layer": wav2vec_layer,
                        "freeze_wav2vec": freeze_wav2vec,
                        "lstm": self.lstm, "linear": self.linear}

    def _activation_name(self) -> str:
        specs = self.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        if spec.problem == Problem.MONO_LABEL_CLASSIFICATION:
            return "log_softmax"
        return "sigmoid"

    def build_module(self) -> nn.Module:
        return SSeRiouSSModule(
            ssl_hidden=self.ssl_config["hidden"],
            ssl_layers=self.ssl_config["layers"],
            ssl_heads=self.ssl_config["heads"],
            ssl_ffn=self.ssl_config["ffn"],
            ssl_conv_channels=self.ssl_config.get(
                "conv_channels", 512),
            rel_pos_bias=self.ssl_config["rel_pos_bias"],
            ssl_pre_ln=self.ssl_config.get("pre_ln", False),
            ssl_conv_norm=self.ssl_config.get("conv_norm", "group"),
            wav2vec_layer=self.wav2vec_layer,
            lstm_hidden=self.lstm["hidden_size"],
            lstm_layers=self.lstm["num_layers"],
            bidirectional=self.lstm["bidirectional"],
            linear_hidden=self.linear["hidden_size"],
            linear_layers=self.linear["num_layers"],
            dimension=self.dimension,
            activation=self._activation_name(),
        )

    def build(self, rng=None) -> "SSeRiouSS":
        had_params = self.params is not None
        super().build(rng)
        if self._ssl_state is not None and not had_params:
            self.load_ssl_weights(self._ssl_state)
        return self

    def frozen_mask_prefixes(self):
        """For GraduallyUnfreeze / optimizer masking."""
        return ["wav2vec"] if self.freeze_wav2vec else []

    def num_frames(self, num_samples: int) -> int:
        return SSLEncoder.num_frames(num_samples)

    def receptive_field_size(self, num_frames: int = 1) -> int:
        return SSLEncoder.receptive_field_size(num_frames)

    def receptive_field_center(self, frame: int = 0) -> int:
        return SSLEncoder.receptive_field_center(frame)

    def convert_torch_state_dict(self, state: Dict[str, np.ndarray]):
        """Map a FULL reference SSeRiouSS state_dict onto our pytree.

        Reference layout (SSeRiouSS.py:96-150): ``wav2vec.*`` is a
        torchaudio wav2vec2_model (normalized to HF keys by the SSL
        converter), ``wav2vec_weights`` the per-layer averaging logits,
        plus the monolithic ``lstm.*``, ``linear.{i}.*`` and
        ``classifier`` head.
        """

        def get(*names):
            for n in names:
                if n in state:
                    return np.asarray(state[n], dtype=np.float32)
            raise KeyError(f"missing key (tried {names})")

        p: Dict = {"lstm": {}}
        ssl_state = {k[len("wav2vec."):]: v for k, v in state.items()
                     if k.startswith("wav2vec.")}
        p["wav2vec"] = convert_torch_wav2vec2(
            ssl_state, layers=self.ssl_config["layers"])
        if "wav2vec_weights" in state:
            p["layer_weights"] = get("wav2vec_weights").reshape(-1)
        for i in range(self.lstm["num_layers"]):
            for suffix in ("", "_reverse"):
                if suffix and not self.lstm["bidirectional"]:
                    continue
                for kind in ("weight_ih", "weight_hh", "bias_ih",
                             "bias_hh"):
                    ours = kind.replace("weight_", "w_").replace(
                        "bias_", "b_")
                    # monolithic or per-layer ModuleList layout
                    # (reference SSeRiouSS.py:141-166)
                    p["lstm"][f"{ours}_l{i}{suffix}"] = get(
                        f"lstm.{kind}_l{i}{suffix}",
                        f"lstm.{i}.{kind}_l0{suffix}")
        for i in range(self.linear["num_layers"]):
            p[f"linear_{i}"] = {"kernel": get(f"linear.{i}.weight").T,
                                "bias": get(f"linear.{i}.bias")}
        p["classifier"] = {"kernel": get("classifier.weight").T,
                           "bias": get("classifier.bias")}
        return {"params": p}

    #: reference import path for exported checkpoints
    REFERENCE_ARCHITECTURE = ("pyannote.audio.models.segmentation",
                              "SSeRiouSS")

    def export_torch_state_dict(self) -> Dict[str, np.ndarray]:
        """Inverse of :meth:`convert_torch_state_dict`: ``wav2vec.*`` in
        the torchaudio layout the reference stores (SSeRiouSS.py:96-123),
        ``wav2vec_weights``, and the monolithic lstm / linear /
        classifier head."""
        from ..blocks.ssl import export_torch_wav2vec2
        if self.params is None:
            raise ValueError("build or load the model before exporting")
        p = self.params["params"]
        a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
        state = {f"wav2vec.{key}": value for key, value in
                 export_torch_wav2vec2(p["wav2vec"],
                                       layers=self.ssl_config["layers"],
                                       layout="torchaudio").items()}
        if "layer_weights" in p:
            state["wav2vec_weights"] = a(p["layer_weights"]).reshape(-1)
        for i in range(self.lstm["num_layers"]):
            for suffix in ("", "_reverse"):
                if suffix and not self.lstm["bidirectional"]:
                    continue
                for kind in ("weight_ih", "weight_hh", "bias_ih",
                             "bias_hh"):
                    ours = kind.replace("weight_", "w_").replace(
                        "bias_", "b_")
                    state[f"lstm.{kind}_l{i}{suffix}"] = a(
                        p["lstm"][f"{ours}_l{i}{suffix}"])
        for i in range(self.linear["num_layers"]):
            state[f"linear.{i}.weight"] = a(p[f"linear_{i}"]["kernel"]).T
            state[f"linear.{i}.bias"] = a(p[f"linear_{i}"]["bias"])
        state["classifier.weight"] = a(p["classifier"]["kernel"]).T
        state["classifier.bias"] = a(p["classifier"]["bias"])
        return state

    def load_ssl_weights(self, state: Dict[str, np.ndarray]) -> None:
        """Load a torch wav2vec2/WavLM state dict into the trunk."""
        trunk = convert_torch_wav2vec2(
            state, layers=self.ssl_config["layers"])
        if self.params is None:
            self.build()
        params = jax.tree_util.tree_map(lambda x: x, self.params)
        params["params"]["wav2vec"] = jax.tree_util.tree_map(
            jnp.asarray, _merge_trunk(params["params"]["wav2vec"], trunk))
        self.params = params
        self._jitted_apply = None


def _merge_trunk(existing: Dict, converted: Dict) -> Dict:
    """Graft converted leaves onto the existing trunk structure."""
    out = dict(existing)
    for key, value in converted.items():
        if key in out and isinstance(value, dict):
            out[key] = _merge_trunk(out[key], value)
        else:
            out[key] = value
    return out
