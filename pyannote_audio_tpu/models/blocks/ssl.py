"""Self-supervised speech encoder (wav2vec2 / WavLM family) in flax.

Supports the reference's SSeRiouSS segmentation trunk
(/root/reference/src/pyannote/audio/models/segmentation/SSeRiouSS.py),
which wraps torchaudio's WAV2VEC2/WAVLM bundles. Architecture follows the
public papers (Baevski et al. 2020; Chen et al. 2022): 7-layer strided
conv feature extractor (512 ch, strides 5,2,2,2,2,2,2) -> layer-norm +
projection -> conv positional embedding -> pre-LN transformer stack.
WavLM's gated relative position bias is implemented behind
``rel_pos_bias=True``.

TPU-native: attention/FFN are plain MXU matmuls; per-layer hidden states
can be returned for learnable layer-weight averaging (SSeRiouSS.py:125).
Weights convert from HF torch checkpoints (convert_torch_wav2vec2).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.receptive_field import (multi_conv_num_frames,
                                      multi_conv_receptive_field_center,
                                      multi_conv_receptive_field_size)

CONV_KERNELS = (10, 3, 3, 3, 3, 2, 2)
CONV_STRIDES = (5, 2, 2, 2, 2, 2, 2)


class FeatureExtractor(nn.Module):
    """7 strided conv layers over the raw waveform.

    ``norm_mode="group"`` (wav2vec2/WavLM BASE): bias-free convs, one
    group norm (groups == channels) after conv 0. ``norm_mode="layer"``
    (LARGE variants): biased convs, per-layer LayerNorm over channels —
    HF feat_extract_norm="layer" semantics.
    """

    channels: int = 512
    norm_mode: str = "group"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, T) -> (B, T', C)
        h = x[..., None]
        for i, (k, s) in enumerate(zip(CONV_KERNELS, CONV_STRIDES)):
            h = nn.Conv(self.channels, (k,), strides=(s,),
                        padding="VALID",
                        use_bias=self.norm_mode == "layer",
                        name=f"conv_{i}")(h)
            if self.norm_mode == "layer":
                h = nn.LayerNorm(epsilon=1e-5, name=f"layer_norm_{i}")(h)
            elif i == 0:
                h = nn.GroupNorm(num_groups=self.channels, epsilon=1e-5,
                                 name="group_norm")(h)
            h = nn.gelu(h, approximate=False)
        return h


class ConvPositionalEmbedding(nn.Module):
    hidden: int = 768
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel // 2
        h = nn.Conv(self.hidden, (self.kernel,), padding=pad,
                    feature_group_count=self.groups, name="conv")(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]
        return x + nn.gelu(h, approximate=False)


class RelPositionBias(nn.Module):
    """WavLM relative position bias table (Chen et al. 2022): bucketed
    relative positions -> per-head bias, computed once and shared by every
    layer (the HF/torch table lives in layer 0's attention). Gating is
    PER LAYER (TransformerLayer), matching WavLMAttention exactly."""

    num_heads: int = 12
    num_buckets: int = 320
    max_distance: int = 800

    def _bucket(self, relative_position: jnp.ndarray) -> jnp.ndarray:
        num_buckets = self.num_buckets // 2
        ret = (relative_position > 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(relative_position)
        max_exact = num_buckets // 2
        is_small = n < max_exact
        large = max_exact + (
            jnp.log(jnp.maximum(n.astype(jnp.float32), 1.0) / max_exact)
            / np.log(self.max_distance / max_exact)
            * (num_buckets - max_exact)).astype(jnp.int32)
        large = jnp.minimum(large, num_buckets - 1)
        return ret + jnp.where(is_small, n, large)

    @nn.compact
    def __call__(self, seq_len: int) -> jnp.ndarray:
        pos = jnp.arange(seq_len)
        rel = pos[None, :] - pos[:, None]        # memory - context
        buckets = self._bucket(rel)
        table = self.param("rel_attn_embed", nn.initializers.normal(0.02),
                           (self.num_buckets, self.num_heads))
        bias = table[buckets]                       # (T, T, H)
        return jnp.transpose(bias, (2, 0, 1))       # (H, T, T)


class TransformerLayer(nn.Module):
    """One encoder layer; ``pre_ln`` selects HF do_stable_layer_norm
    semantics (True: pre-norm, LARGE models; False: post-norm, BASE).
    With ``rel_pos_gate`` the shared WavLM position bias is gated per
    layer from this layer's attention input (WavLMAttention:169-180:
    sigmoid-projected (2,4)-summed gates, a * (b * const - 1) + 2)."""

    hidden: int = 768
    heads: int = 12
    ffn: int = 3072
    pre_ln: bool = True
    rel_pos_gate: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 position_bias: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(x) if self.pre_ln else x
        B, T, D = h.shape
        Hd = D // self.heads
        bias = None
        if position_bias is not None and self.rel_pos_gate:
            gate_in = jnp.transpose(
                h.reshape(B, T, self.heads, Hd), (0, 2, 1, 3))
            proj = nn.Dense(8, name="gru_rel_pos_linear")(gate_in)
            proj = proj.reshape(B, self.heads, T, 2, 4).sum(-1)
            gates = jax.nn.sigmoid(proj)             # (B, H, T, 2)
            const = self.param("gru_rel_pos_const", nn.initializers.ones,
                               (1, self.heads, 1, 1))
            gate = gates[..., 0:1] * (gates[..., 1:2] * const - 1.0) + 2.0
            bias = gate * position_bias[None]        # (B, H, T, T)
        elif position_bias is not None:
            bias = position_bias[None]
        q = nn.Dense(D, name="q")(h).reshape(B, T, self.heads, Hd)
        k = nn.Dense(D, name="k")(h).reshape(B, T, self.heads, Hd)
        v = nn.Dense(D, name="v")(h).reshape(B, T, self.heads, Hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(Hd)
        if bias is not None:
            logits = logits + bias
        attn = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B, T, D)
        x = x + nn.Dense(D, name="out")(ctx)
        if not self.pre_ln:
            x = nn.LayerNorm(epsilon=1e-5, name="attn_norm")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(x) if self.pre_ln else x
        h = nn.Dense(self.ffn, name="ffn_in")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(D, name="ffn_out")(h)
        if not self.pre_ln:
            x = nn.LayerNorm(epsilon=1e-5, name="ffn_norm")(x)
        return x


class SSLEncoder(nn.Module):
    """Full wav2vec2/WavLM encoder returning all layer hidden states.

    ``pre_ln`` mirrors HF do_stable_layer_norm: True (LARGE) puts the
    encoder LayerNorm after the last layer; False (BASE) applies it right
    after the positional conv, before the layer stack — both use the
    ``final_norm`` parameter (HF key encoder.layer_norm)."""

    hidden: int = 768
    layers: int = 12
    heads: int = 12
    ffn: int = 3072
    conv_channels: int = 512
    rel_pos_bias: bool = False    # True for WavLM
    pre_ln: bool = True           # HF do_stable_layer_norm
    conv_norm_mode: str = "group"
    #: apply the encoder LayerNorm to the LAST returned state in pre_ln
    #: mode (HF last_hidden_state convention). torchaudio's
    #: extract_features returns RAW layer outputs — layer-averaging
    #: consumers (SSeRiouSS) pass False for that parity.
    normalize_last: bool = True

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray) -> List[jnp.ndarray]:
        # waveforms: (B, channels, T) or (B, T)
        x = waveforms[:, 0] if waveforms.ndim == 3 else waveforms
        feats = FeatureExtractor(self.conv_channels,
                                 norm_mode=self.conv_norm_mode,
                                 name="feature_extractor")(x)
        h = nn.LayerNorm(epsilon=1e-5, name="feature_norm")(feats)
        h = nn.Dense(self.hidden, name="feature_projection")(h)
        h = ConvPositionalEmbedding(self.hidden, name="pos_conv")(h)
        if not self.pre_ln:
            h = nn.LayerNorm(epsilon=1e-5, name="final_norm")(h)
        states = [h]
        position_bias = None
        if self.rel_pos_bias:
            position_bias = RelPositionBias(
                self.heads, name="rel_pos")(h.shape[1])
        for i in range(self.layers):
            h = TransformerLayer(self.hidden, self.heads, self.ffn,
                                 pre_ln=self.pre_ln,
                                 rel_pos_gate=self.rel_pos_bias,
                                 name=f"layer_{i}")(
                                     h, position_bias=position_bias)
            states.append(h)
        if self.pre_ln and self.normalize_last:
            states[-1] = nn.LayerNorm(epsilon=1e-5, name="final_norm")(states[-1])
        return states

    @staticmethod
    def num_frames(num_samples: int) -> int:
        return multi_conv_num_frames(
            num_samples, kernel_size=list(CONV_KERNELS),
            stride=list(CONV_STRIDES), padding=[0] * 7, dilation=[1] * 7)

    @staticmethod
    def receptive_field_size(num_frames: int = 1) -> int:
        return multi_conv_receptive_field_size(
            num_frames, kernel_size=list(CONV_KERNELS),
            stride=list(CONV_STRIDES), dilation=[1] * 7)

    @staticmethod
    def receptive_field_center(frame: int = 0) -> int:
        return multi_conv_receptive_field_center(
            frame, kernel_size=list(CONV_KERNELS),
            stride=list(CONV_STRIDES), padding=[0] * 7, dilation=[1] * 7)


def _normalize_ssl_keys(state: Dict[str, np.ndarray]
                        ) -> Dict[str, np.ndarray]:
    """Fold torchaudio ``wav2vec2_model`` naming onto the HF layout.

    torchaudio (the reference's SSL runtime, SSeRiouSS.py:96-123) nests
    the projection and transformer one level deeper:
    ``encoder.feature_projection.*`` -> ``feature_projection.*`` and
    ``encoder.transformer.*`` -> ``encoder.*``; per-layer module names
    (attention.{q,k,v,out}_proj, layer_norm, final_layer_norm,
    feed_forward.*) already coincide.
    """
    out = {}
    for key, value in state.items():
        if key.startswith("encoder.transformer."):
            key = "encoder." + key[len("encoder.transformer."):]
        elif key.startswith("encoder.feature_projection."):
            key = "feature_projection." \
                + key[len("encoder.feature_projection."):]
        out[key] = value
    return out


def convert_torch_wav2vec2(state: Dict[str, np.ndarray],
                           layers: int = 12) -> Dict:
    """Map an HF torch Wav2Vec2Model/WavLMModel state dict to SSLEncoder.

    Handles the ``wav2vec2.`` / bare prefixes of HF checkpoints and the
    torchaudio ``wav2vec2_model`` layout (_normalize_ssl_keys).
    """
    state = _normalize_ssl_keys(state)
    def get(*names):
        for n in names:
            for prefix in ("", "wav2vec2.", "wavlm."):
                if prefix + n in state:
                    return np.asarray(state[prefix + n], dtype=np.float32)
        raise KeyError(names)

    def has(name):
        return any(prefix + name in state
                   for prefix in ("", "wav2vec2.", "wavlm."))

    p: Dict = {"feature_extractor": {}, "pos_conv": {}}
    fe = p["feature_extractor"]
    # HF feat_extract_norm="layer" (LARGE): per-layer LayerNorm + conv
    # biases; "group" (BASE): bias-free convs, group norm after conv 0
    layer_mode = has("feature_extractor.conv_layers.1.layer_norm.weight")
    for i in range(7):
        w = get(f"feature_extractor.conv_layers.{i}.conv.weight")
        conv = {"kernel": w.transpose(2, 1, 0)}
        if layer_mode and has(f"feature_extractor.conv_layers.{i}"
                              ".conv.bias"):
            conv["bias"] = get(
                f"feature_extractor.conv_layers.{i}.conv.bias")
        fe[f"conv_{i}"] = conv
        if layer_mode:
            fe[f"layer_norm_{i}"] = {
                "scale": get(f"feature_extractor.conv_layers.{i}"
                             ".layer_norm.weight"),
                "bias": get(f"feature_extractor.conv_layers.{i}"
                            ".layer_norm.bias")}
    if not layer_mode:
        fe["group_norm"] = {
            "scale": get(
                "feature_extractor.conv_layers.0.layer_norm.weight"),
            "bias": get(
                "feature_extractor.conv_layers.0.layer_norm.bias")}
    p["feature_norm"] = {
        "scale": get("feature_projection.layer_norm.weight"),
        "bias": get("feature_projection.layer_norm.bias")}
    p["feature_projection"] = {
        "kernel": get("feature_projection.projection.weight").T,
        "bias": get("feature_projection.projection.bias")}
    w = get("encoder.pos_conv_embed.conv.weight_v",
            "encoder.pos_conv_embed.conv.parametrizations.weight.original1")
    g = get("encoder.pos_conv_embed.conv.weight_g",
            "encoder.pos_conv_embed.conv.parametrizations.weight.original0")
    norm = np.linalg.norm(w, axis=(0, 1), keepdims=True)
    full = (g / (norm + 1e-8)) * w
    p["pos_conv"] = {"conv": {
        "kernel": full.transpose(2, 1, 0),
        "bias": get("encoder.pos_conv_embed.conv.bias")}}
    # WavLM: shared rel-pos table lives in layer 0's attention
    if has("encoder.layers.0.attention.rel_attn_embed.weight"):
        p["rel_pos"] = {"rel_attn_embed": get(
            "encoder.layers.0.attention.rel_attn_embed.weight")}
    for i in range(layers):
        base = f"encoder.layers.{i}"
        layer = {
            "attn_norm": {"scale": get(f"{base}.layer_norm.weight"),
                          "bias": get(f"{base}.layer_norm.bias")},
            "q": {"kernel": get(f"{base}.attention.q_proj.weight").T,
                  "bias": get(f"{base}.attention.q_proj.bias")},
            "k": {"kernel": get(f"{base}.attention.k_proj.weight").T,
                  "bias": get(f"{base}.attention.k_proj.bias")},
            "v": {"kernel": get(f"{base}.attention.v_proj.weight").T,
                  "bias": get(f"{base}.attention.v_proj.bias")},
            "out": {"kernel": get(f"{base}.attention.out_proj.weight").T,
                    "bias": get(f"{base}.attention.out_proj.bias")},
            "ffn_norm": {
                "scale": get(f"{base}.final_layer_norm.weight"),
                "bias": get(f"{base}.final_layer_norm.bias")},
            "ffn_in": {
                "kernel": get(f"{base}.feed_forward."
                              "intermediate_dense.weight").T,
                "bias": get(f"{base}.feed_forward."
                            "intermediate_dense.bias")},
            "ffn_out": {
                "kernel": get(f"{base}.feed_forward."
                              "output_dense.weight").T,
                "bias": get(f"{base}.feed_forward.output_dense.bias")},
        }
        if has(f"{base}.attention.gru_rel_pos_linear.weight"):
            layer["gru_rel_pos_linear"] = {
                "kernel": get(
                    f"{base}.attention.gru_rel_pos_linear.weight").T,
                "bias": get(f"{base}.attention.gru_rel_pos_linear.bias")}
            layer["gru_rel_pos_const"] = get(
                f"{base}.attention.gru_rel_pos_const")
        p[f"layer_{i}"] = layer
    p["final_norm"] = {"scale": get("encoder.layer_norm.weight"),
                       "bias": get("encoder.layer_norm.bias")}
    return p


def export_torch_wav2vec2(p: Dict, layers: int = 12,
                          layout: str = "hf") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_torch_wav2vec2`: SSLEncoder params ->
    a torch wav2vec2/WavLM state dict.

    ``layout="hf"`` emits HF Wav2Vec2Model/WavLMModel naming;
    ``"torchaudio"`` the torchaudio ``wav2vec2_model`` nesting the
    reference's SSeRiouSS stores under ``wav2vec.*``
    (inverse of _normalize_ssl_keys). The pos-conv weight norm is
    re-factored as weight_v = fused kernel, weight_g = its (out, in)
    norm — numerically identical under the forward mapping.
    """
    a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
    state: Dict[str, np.ndarray] = {}
    fe = p["feature_extractor"]
    layer_mode = "layer_norm_1" in fe
    for i in range(7):
        state[f"feature_extractor.conv_layers.{i}.conv.weight"] = a(
            fe[f"conv_{i}"]["kernel"]).transpose(2, 1, 0)
        if "bias" in fe[f"conv_{i}"]:
            state[f"feature_extractor.conv_layers.{i}.conv.bias"] = a(
                fe[f"conv_{i}"]["bias"])
        if layer_mode:
            state[f"feature_extractor.conv_layers.{i}"
                  ".layer_norm.weight"] = a(fe[f"layer_norm_{i}"]["scale"])
            state[f"feature_extractor.conv_layers.{i}"
                  ".layer_norm.bias"] = a(fe[f"layer_norm_{i}"]["bias"])
    if not layer_mode:
        state["feature_extractor.conv_layers.0.layer_norm.weight"] = a(
            fe["group_norm"]["scale"])
        state["feature_extractor.conv_layers.0.layer_norm.bias"] = a(
            fe["group_norm"]["bias"])
    state["feature_projection.layer_norm.weight"] = a(
        p["feature_norm"]["scale"])
    state["feature_projection.layer_norm.bias"] = a(
        p["feature_norm"]["bias"])
    state["feature_projection.projection.weight"] = a(
        p["feature_projection"]["kernel"]).T
    state["feature_projection.projection.bias"] = a(
        p["feature_projection"]["bias"])
    full = a(p["pos_conv"]["conv"]["kernel"]).transpose(2, 1, 0)
    state["encoder.pos_conv_embed.conv.weight_v"] = full
    state["encoder.pos_conv_embed.conv.weight_g"] = np.linalg.norm(
        full, axis=(0, 1), keepdims=True).astype(np.float32)
    state["encoder.pos_conv_embed.conv.bias"] = a(
        p["pos_conv"]["conv"]["bias"])
    if "rel_pos" in p:
        state["encoder.layers.0.attention.rel_attn_embed.weight"] = a(
            p["rel_pos"]["rel_attn_embed"])
    for i in range(layers):
        layer, base = p[f"layer_{i}"], f"encoder.layers.{i}"
        state[f"{base}.layer_norm.weight"] = a(layer["attn_norm"]["scale"])
        state[f"{base}.layer_norm.bias"] = a(layer["attn_norm"]["bias"])
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("out", "out_proj")):
            state[f"{base}.attention.{theirs}.weight"] = a(
                layer[ours]["kernel"]).T
            state[f"{base}.attention.{theirs}.bias"] = a(
                layer[ours]["bias"])
        state[f"{base}.final_layer_norm.weight"] = a(
            layer["ffn_norm"]["scale"])
        state[f"{base}.final_layer_norm.bias"] = a(
            layer["ffn_norm"]["bias"])
        state[f"{base}.feed_forward.intermediate_dense.weight"] = a(
            layer["ffn_in"]["kernel"]).T
        state[f"{base}.feed_forward.intermediate_dense.bias"] = a(
            layer["ffn_in"]["bias"])
        state[f"{base}.feed_forward.output_dense.weight"] = a(
            layer["ffn_out"]["kernel"]).T
        state[f"{base}.feed_forward.output_dense.bias"] = a(
            layer["ffn_out"]["bias"])
        if "gru_rel_pos_linear" in layer:
            state[f"{base}.attention.gru_rel_pos_linear.weight"] = a(
                layer["gru_rel_pos_linear"]["kernel"]).T
            state[f"{base}.attention.gru_rel_pos_linear.bias"] = a(
                layer["gru_rel_pos_linear"]["bias"])
            state[f"{base}.attention.gru_rel_pos_const"] = a(
                layer["gru_rel_pos_const"])
    state["encoder.layer_norm.weight"] = a(p["final_norm"]["scale"])
    state["encoder.layer_norm.bias"] = a(p["final_norm"]["bias"])
    if layout == "torchaudio":
        out = {}
        for key, value in state.items():
            if key.startswith("encoder."):
                key = "encoder.transformer." + key[len("encoder."):]
            elif key.startswith("feature_projection."):
                key = "encoder." + key
            out[key] = value
        return out
    return state
