"""ECAPA-TDNN speaker embedding (flax) + SpeechBrain checkpoint converter.

Closes the reference's SpeechBrain embedding backend
(/root/reference/src/pyannote/audio/pipelines/speaker_verification.py:202-383,
which wraps speechbrain.inference.EncoderClassifier around
speechbrain/spkrec-ecapa-voxceleb) with a NATIVE implementation: no
speechbrain runtime is needed — a local (or hub-downloaded) speechbrain
snapshot directory (hyperparams.yaml + embedding_model.ckpt) converts
directly onto this flax module.

Architecture (Desplanques et al., "ECAPA-TDNN: Emphasized Channel
Attention, Propagation and Aggregation in TDNN Based Speaker
Verification", Interspeech 2020; layer/key layout from
speechbrain.lobes.models.ECAPA_TDNN):

  fbank(80) -> sentence mean-norm
  -> TDNNBlock(C0, k=5, d=1)                             blocks.0
  -> 3 x SERes2NetBlock(Ci, k=3, d=2/3/4, scale=8)       blocks.1-3
  -> cat(blocks 1..3 outputs) -> TDNNBlock(3*C, k=1)     mfa
  -> attentive stats pooling (global context)            asp
  -> BatchNorm -> Linear(lin_neurons)                    asp_bn, fc

TPU-native design notes: NTC layout throughout (flax-native; torch NCT
checkpoints convert by kernel transpose); every conv is a dilated MXU
conv with precomputed reflect padding; masked statistics broadcast over
the batch so a whole (chunks x speakers) panel pools in one fused pass;
BatchNorm runs off stored running statistics.

SpeechBrain fidelity caveats (speechbrain is not installed in this
environment, so parity is locked by a torch replica written from the
speechbrain source layout, tests/test_ecapa_parity.py): reflect 'same'
conv padding, symmetric-triangle mel filterbank, per-utterance top-db
floor, masked softmax attention with binary length masks.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Resolution, Specifications
from ...ops.fbank import speechbrain_fbank, speechbrain_fbank_num_frames
from ...utils.signal import nearest_binary_mask


class _TDNNBlock(nn.Module):
    """Conv1d('same', reflect) -> ReLU -> BatchNorm.

    Parity: speechbrain TDNNBlock (conv -> activation -> norm); the
    speechbrain Conv1d wrapper pads d*(k-1)//2 on each side in reflect
    mode before a VALID conv.
    """

    out_channels: int
    kernel_size: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.dilation * (self.kernel_size - 1) // 2
        if pad:
            x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
        x = nn.Conv(self.out_channels, (self.kernel_size,),
                    kernel_dilation=(self.dilation,), padding="VALID",
                    name="conv")(x)
        x = nn.relu(x)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="norm")(x)


class _Res2NetBlock(nn.Module):
    """Multi-scale residual: chunk channels into ``scale`` groups; group 0
    passes through, group i>0 runs a TDNN over (x_i + y_{i-1})."""

    out_channels: int
    scale: int = 8
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_chunk = x.shape[-1] // self.scale
        hidden = self.out_channels // self.scale
        xs = [x[..., i * in_chunk:(i + 1) * in_chunk]
              for i in range(self.scale)]
        ys = [xs[0]]
        y_i = None
        for i in range(1, self.scale):
            inp = xs[i] if i == 1 else xs[i] + y_i
            y_i = _TDNNBlock(hidden, self.kernel_size, self.dilation,
                             name=f"block_{i - 1}")(inp, train=train)
            ys.append(y_i)
        return jnp.concatenate(ys, axis=-1)


class _SEBlock(nn.Module):
    """Squeeze-excitation over the (masked) temporal mean."""

    se_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if mask is None:
            s = jnp.mean(x, axis=1, keepdims=True)
        else:
            m = mask[..., None]
            # speechbrain divides by the raw mask total (no clamp); an
            # all-silent mask propagates NaN, which the wrapper maps to
            # the reference's NaN-embedding sentinel
            s = jnp.sum(x * m, axis=1, keepdims=True) \
                / jnp.sum(m, axis=1, keepdims=True)
        s = nn.relu(nn.Conv(self.se_channels, (1,), name="conv1")(s))
        s = nn.sigmoid(nn.Conv(self.out_channels, (1,), name="conv2")(s))
        return s * x


class _SERes2NetBlock(nn.Module):
    out_channels: int
    res2net_scale: int = 8
    se_channels: int = 128
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        residual = x
        if x.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1,), name="shortcut")(x)
        y = _TDNNBlock(self.out_channels, 1, 1, name="tdnn1")(x,
                                                              train=train)
        y = _Res2NetBlock(self.out_channels, self.res2net_scale,
                          self.kernel_size, self.dilation,
                          name="res2net_block")(y, train=train)
        y = _TDNNBlock(self.out_channels, 1, 1, name="tdnn2")(y,
                                                              train=train)
        y = _SEBlock(self.se_channels, self.out_channels,
                     name="se_block")(y, mask=mask, train=train)
        return y + residual


class _AttentiveStatsPool(nn.Module):
    """Attention-weighted mean+std pooling with optional global context.

    Parity: speechbrain AttentiveStatisticsPooling — attention logits from
    conv(tanh(tdnn([x; mean; std]))), -inf-masked softmax over time, stats
    with the attention weights; std floor eps=1e-12.
    """

    attention_channels: int = 128
    global_context: bool = True
    eps: float = 1e-12

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        B, T, C = x.shape
        m = (jnp.ones((B, T), x.dtype) if mask is None else mask)[..., None]

        def stats(values, weights):
            mean = jnp.sum(weights * values, axis=1)            # (B, C)
            var = jnp.sum(weights * jnp.square(
                values - mean[:, None, :]), axis=1)
            return mean, jnp.sqrt(jnp.maximum(var, self.eps))

        if self.global_context:
            total = jnp.sum(m, axis=1, keepdims=True)
            mean, std = stats(x, m / total)
            attn = jnp.concatenate(
                [x, jnp.broadcast_to(mean[:, None, :], x.shape),
                 jnp.broadcast_to(std[:, None, :], x.shape)], axis=-1)
        else:
            attn = x
        attn = _TDNNBlock(self.attention_channels, 1, 1,
                          name="tdnn")(attn, train=train)
        attn = nn.Conv(C, (1,), name="conv")(jnp.tanh(attn))
        attn = jnp.where(m > 0, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=1)
        mean, std = stats(x, attn)
        return jnp.concatenate([mean, std], axis=-1)             # (B, 2C)


class ECAPAModule(nn.Module):
    """fbank features -> 192-dim embedding (speechbrain ECAPA_TDNN)."""

    n_mels: int = 80
    channels: Sequence[int] = (1024, 1024, 1024, 1024, 3072)
    kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1)
    dilations: Sequence[int] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    lin_neurons: int = 192
    input_norm: bool = True   # InputNormalization(sentence, std_norm=False)

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        """(B, T, n_mels) fbank [+ (B, T) binary frame mask] -> (B, lin)."""
        if self.input_norm:
            if mask is None:
                mean = jnp.mean(feats, axis=1, keepdims=True)
            else:
                m = mask[..., None]
                mean = jnp.sum(feats * m, axis=1, keepdims=True) \
                    / jnp.sum(m, axis=1, keepdims=True)
            feats = feats - mean
        x = _TDNNBlock(self.channels[0], self.kernel_sizes[0],
                       self.dilations[0], name="blocks_0")(feats,
                                                           train=train)
        hidden = []
        for i in range(1, len(self.channels) - 1):
            x = _SERes2NetBlock(
                self.channels[i], res2net_scale=self.res2net_scale,
                se_channels=self.se_channels,
                kernel_size=self.kernel_sizes[i],
                dilation=self.dilations[i],
                name=f"blocks_{i}")(x, mask=mask, train=train)
            hidden.append(x)
        x = jnp.concatenate(hidden, axis=-1)
        x = _TDNNBlock(self.channels[-1], self.kernel_sizes[-1],
                       self.dilations[-1], name="mfa")(x, train=train)
        x = _AttentiveStatsPool(
            attention_channels=self.attention_channels,
            global_context=self.global_context,
            name="asp")(x, mask=mask, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="asp_bn")(x)
        return nn.Dense(self.lin_neurons, name="fc")(x)


class ECAPA_TDNN(Model):
    """Native ECAPA-TDNN with SpeechBrain two-way checkpoint conversion.

    Default hyperparameters match speechbrain/spkrec-ecapa-voxceleb.
    """

    def __init__(self, sample_rate: int = 16000, num_channels: int = 1,
                 n_mels: int = 80,
                 channels: Sequence[int] = (1024, 1024, 1024, 1024, 3072),
                 kernel_sizes: Sequence[int] = (5, 3, 3, 3, 1),
                 dilations: Sequence[int] = (1, 2, 3, 4, 1),
                 attention_channels: int = 128, res2net_scale: int = 8,
                 se_channels: int = 128, global_context: bool = True,
                 lin_neurons: int = 192, n_fft: int = 400,
                 win_length: Optional[int] = None,
                 hop_length: Optional[int] = None,
                 f_min: float = 0.0, f_max: float = 8000.0,
                 task=None, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        self.n_mels = n_mels
        # SpeechBrain Fbank geometry: 25 ms / 10 ms windows at the
        # model's rate; n_fft and f_max are rate-INdependent upstream
        # defaults (speechbrain.lobes.features.Fbank)
        self.n_fft = int(n_fft)
        self.win_length = int(win_length if win_length is not None
                              else round(sample_rate * 0.025))
        self.hop_length = int(hop_length if hop_length is not None
                              else round(sample_rate * 0.010))
        self.f_min = float(f_min)
        self.f_max = float(f_max)
        self.channels = tuple(int(c) for c in channels)
        self.kernel_sizes = tuple(int(k) for k in kernel_sizes)
        self.dilations = tuple(int(d) for d in dilations)
        self.attention_channels = attention_channels
        self.res2net_scale = res2net_scale
        self.se_channels = se_channels
        self.global_context = bool(global_context)
        self.lin_neurons = lin_neurons
        self.hparams = {
            "n_mels": n_mels, "channels": list(self.channels),
            "kernel_sizes": list(self.kernel_sizes),
            "dilations": list(self.dilations),
            "attention_channels": attention_channels,
            "res2net_scale": res2net_scale, "se_channels": se_channels,
            "global_context": self.global_context,
            "lin_neurons": lin_neurons, "n_fft": self.n_fft,
            "win_length": self.win_length, "hop_length": self.hop_length,
            "f_min": self.f_min, "f_max": self.f_max}
        if self._specifications is None and task is None:
            self._specifications = Specifications(
                problem=Problem.REPRESENTATION,
                resolution=Resolution.CHUNK,
                duration=5.0, min_duration=0.5)

    def build_module(self) -> nn.Module:
        return ECAPAModule(
            n_mels=self.n_mels, channels=self.channels,
            kernel_sizes=self.kernel_sizes, dilations=self.dilations,
            attention_channels=self.attention_channels,
            res2net_scale=self.res2net_scale,
            se_channels=self.se_channels,
            global_context=self.global_context,
            lin_neurons=self.lin_neurons)

    def example_input_array(self) -> jnp.ndarray:
        # module input is fbank features, not raw audio
        return jnp.zeros((1, 101, self.n_mels), jnp.float32)

    @property
    def dimension(self) -> int:
        return self.lin_neurons

    def num_frames(self, num_samples: int) -> int:
        return speechbrain_fbank_num_frames(num_samples, self.hop_length)

    @property
    def min_num_samples(self) -> int:
        """Smallest input every reflect pad accepts (analytic, replacing
        the reference's binary search over forward failures): reflect
        padding needs T > d*(k-1)//2 frames; with the centered STFT,
        T = 1 + samples//hop."""
        pad = max(d * (k - 1) // 2
                  for k, d in zip(self.kernel_sizes, self.dilations))
        # reflect pad needs T >= pad + 1 frames; T = 1 + samples // hop
        return pad * self.hop_length

    def __call__(self, waveforms, weights=None):
        """(batch, [1,] samples) [+ (batch, frames) weights] -> (B, dim).

        ``weights`` follow the pipeline's frame-mask convention at any
        resolution; they are nearest-interpolated to fbank frames and
        binarized at 0.5, matching the reference SpeechBrain wrapper's
        imasks (:348-352).
        """
        if self.module is None:
            self.build()
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(self._forward_from_audio)
        waveforms = jnp.asarray(waveforms, jnp.float32)
        num_frames = self.num_frames(waveforms.shape[-1])
        mask = None
        if weights is not None:
            mask = jnp.asarray(nearest_binary_mask(weights, num_frames),
                               jnp.float32)
        return self._jitted_apply(self.params, waveforms, mask)

    def _forward_from_audio(self, params, waveforms, mask):
        feats = speechbrain_fbank(waveforms, n_mels=self.n_mels,
                                  sample_rate=self.sample_rate,
                                  n_fft=self.n_fft,
                                  win_length=self.win_length,
                                  hop_length=self.hop_length,
                                  f_min=self.f_min, f_max=self.f_max)
        return self.module.apply(params, feats, mask=mask)

    def forward_with_frame_mask(self, signals, frame_mask):
        """(B, samples) signals + (B, frames) binary mask -> (B, dim).

        The SpeechBrain wrapper's entry point: signals are already
        speech-compacted and the mask encodes relative lengths. Jitted
        per (samples, frames) shape — variable-length batches recompile,
        exactly like the reference's dynamic pad_sequence shapes hit new
        cuDNN plans.
        """
        if self.module is None:
            self.build()
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(self._forward_from_audio)
        return self._jitted_apply(self.params,
                                  jnp.asarray(signals, jnp.float32),
                                  jnp.asarray(frame_mask, jnp.float32))

    # -- speechbrain conversion ---------------------------------------------

    def convert_speechbrain_state_dict(
            self, state: Dict[str, np.ndarray]) -> Dict:
        """speechbrain embedding_model.ckpt state dict -> flax variables.

        Key layout (speechbrain wrappers nest the raw torch layer one
        level down): TDNNBlock -> ``conv.conv.weight`` / ``norm.norm.*``;
        SERes2NetBlock -> ``tdnn1/res2net_block.blocks.j/tdnn2/se_block``;
        pooling -> ``asp.tdnn``, ``asp.conv``; head -> ``asp_bn.norm``,
        ``fc.conv``.
        """
        a = lambda k: np.asarray(state[k], dtype=np.float32)  # noqa: E731

        def conv(prefix):
            out = {"kernel": a(f"{prefix}.weight").transpose(2, 1, 0)}
            if f"{prefix}.bias" in state:
                out["bias"] = a(f"{prefix}.bias")
            return out

        def tdnn(prefix):
            p = {"conv": conv(f"{prefix}.conv.conv"),
                 "norm": {"scale": a(f"{prefix}.norm.norm.weight"),
                          "bias": a(f"{prefix}.norm.norm.bias")}}
            s = {"norm": {"mean": a(f"{prefix}.norm.norm.running_mean"),
                          "var": a(f"{prefix}.norm.norm.running_var")}}
            return p, s

        params: Dict = {}
        stats: Dict = {}
        params["blocks_0"], stats["blocks_0"] = tdnn("blocks.0")
        for i in range(1, len(self.channels) - 1):
            name, tp = f"blocks_{i}", f"blocks.{i}"
            bp: Dict = {}
            bs: Dict = {}
            bp["tdnn1"], bs["tdnn1"] = tdnn(f"{tp}.tdnn1")
            r2p: Dict = {}
            r2s: Dict = {}
            for j in range(self.res2net_scale - 1):
                r2p[f"block_{j}"], r2s[f"block_{j}"] = \
                    tdnn(f"{tp}.res2net_block.blocks.{j}")
            bp["res2net_block"], bs["res2net_block"] = r2p, r2s
            bp["tdnn2"], bs["tdnn2"] = tdnn(f"{tp}.tdnn2")
            bp["se_block"] = {"conv1": conv(f"{tp}.se_block.conv1.conv"),
                              "conv2": conv(f"{tp}.se_block.conv2.conv")}
            if f"{tp}.shortcut.conv.weight" in state:
                bp["shortcut"] = conv(f"{tp}.shortcut.conv")
            params[name], stats[name] = bp, bs
        params["mfa"], stats["mfa"] = tdnn("mfa")
        asp_p, asp_s = tdnn("asp.tdnn")
        params["asp"] = {"tdnn": asp_p, "conv": conv("asp.conv.conv")}
        stats["asp"] = {"tdnn": asp_s}
        params["asp_bn"] = {"scale": a("asp_bn.norm.weight"),
                            "bias": a("asp_bn.norm.bias")}
        stats["asp_bn"] = {"mean": a("asp_bn.norm.running_mean"),
                           "var": a("asp_bn.norm.running_var")}
        params["fc"] = {"kernel": a("fc.conv.weight")[:, :, 0].T,
                        "bias": a("fc.conv.bias")}
        return {"params": params, "batch_stats": stats}

    def export_speechbrain_state_dict(self) -> Dict[str, np.ndarray]:
        """Inverse of :meth:`convert_speechbrain_state_dict`: deploy a
        TPU-trained ECAPA on the stock speechbrain stack."""
        if self.params is None:
            raise ValueError("build or load the model before exporting")
        params, stats = self.params["params"], self.params["batch_stats"]
        a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
        state: Dict[str, np.ndarray] = {}

        def put_conv(prefix, p):
            state[f"{prefix}.weight"] = a(p["kernel"]).transpose(2, 1, 0)
            if "bias" in p:
                state[f"{prefix}.bias"] = a(p["bias"])

        def put_tdnn(prefix, p, s):
            put_conv(f"{prefix}.conv.conv", p["conv"])
            state[f"{prefix}.norm.norm.weight"] = a(p["norm"]["scale"])
            state[f"{prefix}.norm.norm.bias"] = a(p["norm"]["bias"])
            state[f"{prefix}.norm.norm.running_mean"] = a(s["norm"]["mean"])
            state[f"{prefix}.norm.norm.running_var"] = a(s["norm"]["var"])
            state[f"{prefix}.norm.norm.num_batches_tracked"] = \
                np.asarray(0, dtype=np.int64)

        put_tdnn("blocks.0", params["blocks_0"], stats["blocks_0"])
        for i in range(1, len(self.channels) - 1):
            name, tp = f"blocks_{i}", f"blocks.{i}"
            put_tdnn(f"{tp}.tdnn1", params[name]["tdnn1"],
                     stats[name]["tdnn1"])
            for j in range(self.res2net_scale - 1):
                put_tdnn(f"{tp}.res2net_block.blocks.{j}",
                         params[name]["res2net_block"][f"block_{j}"],
                         stats[name]["res2net_block"][f"block_{j}"])
            put_tdnn(f"{tp}.tdnn2", params[name]["tdnn2"],
                     stats[name]["tdnn2"])
            put_conv(f"{tp}.se_block.conv1.conv",
                     params[name]["se_block"]["conv1"])
            put_conv(f"{tp}.se_block.conv2.conv",
                     params[name]["se_block"]["conv2"])
            if "shortcut" in params[name]:
                put_conv(f"{tp}.shortcut.conv", params[name]["shortcut"])
        put_tdnn("mfa", params["mfa"], stats["mfa"])
        put_tdnn("asp.tdnn", params["asp"]["tdnn"], stats["asp"]["tdnn"])
        put_conv("asp.conv.conv", params["asp"]["conv"])
        state["asp_bn.norm.weight"] = a(params["asp_bn"]["scale"])
        state["asp_bn.norm.bias"] = a(params["asp_bn"]["bias"])
        state["asp_bn.norm.running_mean"] = a(stats["asp_bn"]["mean"])
        state["asp_bn.norm.running_var"] = a(stats["asp_bn"]["var"])
        state["asp_bn.norm.num_batches_tracked"] = \
            np.asarray(0, dtype=np.int64)
        state["fc.conv.weight"] = a(params["fc"]["kernel"]).T[:, :, None]
        state["fc.conv.bias"] = a(params["fc"]["bias"])
        return state

    @classmethod
    def from_speechbrain(cls, source: Union[str, Path],
                         revision: Optional[str] = None,
                         token: Optional[str] = None,
                         cache_dir=None) -> "ECAPA_TDNN":
        """Load from a speechbrain snapshot (local directory or hub id
        like ``speechbrain/spkrec-ecapa-voxceleb``): hyperparams.yaml for
        the non-inferable hyperparameters, ``embedding_model.ckpt`` for
        the weights. No speechbrain runtime involved."""
        state, hyper = _load_speechbrain_snapshot(
            source, revision=revision, token=token, cache_dir=cache_dir)
        config = _infer_ecapa_config(state, hyper)
        model = cls(**config)
        model.build()
        model.params = model.convert_speechbrain_state_dict(state)
        model._jitted_apply = None
        return model


def _load_speechbrain_snapshot(source: Union[str, Path],
                               revision: Optional[str] = None,
                               token: Optional[str] = None,
                               cache_dir=None
                               ) -> Tuple[Dict[str, np.ndarray],
                                          Dict[str, object]]:
    """(state_dict, hyperparams) from a speechbrain snapshot dir/hub id."""
    from ...utils.hf_hub import download_from_hf_hub

    path = Path(source)
    if path.is_dir():
        ckpt = path / "embedding_model.ckpt"
        hyper_path = path / "hyperparams.yaml"
    else:
        ckpt = download_from_hf_hub(str(source), "embedding_model.ckpt",
                                    revision=revision, token=token,
                                    cache_dir=cache_dir)
        try:
            hyper_path = download_from_hf_hub(
                str(source), "hyperparams.yaml", revision=revision,
                token=token, cache_dir=cache_dir)
        except (FileNotFoundError, OSError):
            hyper_path = None
    if not Path(ckpt).is_file():
        raise FileNotFoundError(
            f"no embedding_model.ckpt under {source!r} — expected a "
            "speechbrain snapshot directory (hyperparams.yaml + "
            "embedding_model.ckpt)")
    import torch
    raw = torch.load(ckpt, map_location="cpu", weights_only=True)
    state = {k: v.numpy() for k, v in raw.items()}
    hyper: Dict[str, object] = {}
    if hyper_path is not None and Path(hyper_path).is_file():
        hyper = _parse_hyperparams(Path(hyper_path).read_text())
    return state, hyper


def _parse_hyperparams(text: str) -> Dict[str, object]:
    """Lenient scan of speechbrain's HyperPyYAML for the ECAPA arguments
    (!new: tags make it invalid plain YAML; only scalar/list fields under
    the embedding_model block and top-level n_mels are needed)."""
    out: Dict[str, object] = {}
    for key in ("sample_rate", "n_mels", "lin_neurons",
                "attention_channels", "res2net_scale", "se_channels"):
        match = re.search(rf"^\s*{key}:\s*(\d+)\s*$", text, re.M)
        if match:
            out[key] = int(match.group(1))
    for key in ("channels", "kernel_sizes", "dilations"):
        match = re.search(rf"^\s*{key}:\s*\[([\d,\s]+)\]", text, re.M)
        if match:
            out[key] = [int(v) for v in match.group(1).split(",")]
    match = re.search(r"^\s*global_context:\s*(\w+)", text, re.M)
    if match:
        out["global_context"] = match.group(1).lower() == "true"
    return out


def _infer_ecapa_config(state: Dict[str, np.ndarray],
                        hyper: Dict[str, object]) -> Dict[str, object]:
    """Infer the architecture from weight shapes; hyperparams.yaml wins
    for fields shapes cannot determine (dilations)."""
    w0 = state["blocks.0.conv.conv.weight"]          # (C0, n_mels, k0)
    num_se = len({int(m.group(1)) for k in state
                  for m in [re.match(r"blocks\.(\d+)\.tdnn1\.", k)] if m})
    scale = 1 + len({int(m.group(1)) for k in state
                     for m in [re.match(
                         r"blocks\.1\.res2net_block\.blocks\.(\d+)\.", k)]
                     if m})
    channels = [int(w0.shape[0])]
    kernel_sizes = [int(w0.shape[2])]
    for i in range(1, num_se + 1):
        channels.append(
            int(state[f"blocks.{i}.tdnn1.conv.conv.weight"].shape[0]))
        kernel_sizes.append(int(state[
            f"blocks.{i}.res2net_block.blocks.0.conv.conv.weight"].shape[2]))
    w_mfa = state["mfa.conv.conv.weight"]
    channels.append(int(w_mfa.shape[0]))
    kernel_sizes.append(int(w_mfa.shape[2]))
    w_att = state["asp.tdnn.conv.conv.weight"]
    dilations = hyper.get("dilations",
                          [1] + list(range(2, num_se + 2)) + [1])
    config = {
        "n_mels": int(w0.shape[1]),
        "channels": channels,
        "kernel_sizes": hyper.get("kernel_sizes", kernel_sizes),
        "dilations": dilations,
        "attention_channels": int(w_att.shape[0]),
        "res2net_scale": scale,
        "se_channels": int(
            state["blocks.1.se_block.conv1.conv.weight"].shape[0]),
        # shape inference is authoritative (attention input width is
        # 3C with global context, C without); hyperparams.yaml may
        # override like the other fields
        "global_context": bool(hyper.get(
            "global_context", w_att.shape[1] == 3 * channels[-1])),
        "lin_neurons": int(state["fc.conv.weight"].shape[0]),
    }
    if "n_mels" in hyper:
        config["n_mels"] = int(hyper["n_mels"])   # should agree w/ shapes
    if "sample_rate" in hyper:
        # drives the 25 ms/10 ms STFT geometry + pipeline resampling; a
        # non-16k snapshot silently produced 16k features before
        config["sample_rate"] = int(hyper["sample_rate"])
    return config
