"""TitaNet: NeMo's speaker-embedding architecture, TPU-native.

Closes the reference's NeMo backend (reference
pipelines/speaker_verification.py:65-200 wraps
nemo_toolkit EncDecSpeakerLabelModel): instead of requiring the NeMo
runtime, the ``.nemo`` archive (a tar with ``model_config.yaml`` +
``model_weights.ckpt``) converts onto this flax implementation — the
same native-conversion strategy as ECAPA-TDNN (ecapa.py) and ONNX
WeSpeaker (utils/onnx.py).

Architecture (nemo.collections.asr, titanet_large.yaml semantics):
  * AudioToMelSpectrogramPreprocessor: 80 log-mels over a centered
    reflect-padded STFT (hann 400/512, hop 160), Slaney mel banks,
    per-feature normalization (ops/fbank.py nemo_mel_spectrogram);
  * ConvASREncoder: a stack of JasperBlocks — time-masked 1-D convs
    (depthwise-separable where configured), BatchNorm, ReLU, global
    squeeze-excitation (reduction 8), pointwise-conv residuals added
    BEFORE the block's final activation;
  * SpeakerDecoder: attentive stats pooling (TDNN attention over
    [x, mean, std] global context) + a BatchNorm/1x1-conv affine layer
    producing the 192-dim embedding (the classification head is
    training-only and dropped at conversion).

Everything is mask-aware so the reference wrapper's masked/compacted
path (speaker_verification.py:135-190) reproduces exactly.
"""

from __future__ import annotations

import io
import tarfile
from pathlib import Path
from typing import Dict, Optional, Sequence, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Resolution, Specifications
from ...ops.fbank import nemo_mel_num_frames, nemo_mel_spectrogram
from ...utils.signal import nearest_binary_mask

# titanet_large.yaml encoder layout (model_defaults filters=1024):
# one prologue block, three repeated separable blocks (k=7/11/15) with
# residuals, one kernel-1 epilogue at 3072 channels — all with global SE
TITANET_LARGE_BLOCKS = [
    dict(filters=1024, repeat=1, kernel=3, residual=False,
         separable=True, se=True),
    dict(filters=1024, repeat=3, kernel=7, residual=True,
         separable=True, se=True),
    dict(filters=1024, repeat=3, kernel=11, residual=True,
         separable=True, se=True),
    dict(filters=1024, repeat=3, kernel=15, residual=True,
         separable=True, se=True),
    dict(filters=3072, repeat=1, kernel=1, residual=False,
         separable=False, se=True),
]


def _masked_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]
                 ) -> jnp.ndarray:
    """(B, T, C) -> (B, C) mean over valid frames."""
    if mask is None:
        return x.mean(axis=1)
    return (x * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1.0)


class _NemoSE(nn.Module):
    """SqueezeExcite (nemo jasper.py): masked global average pool ->
    Linear(C, C/8) -> ReLU -> Linear(C/8, C) -> sigmoid gate."""

    reduction: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 mask: Optional[jnp.ndarray]) -> jnp.ndarray:
        channels = x.shape[-1]
        y = _masked_mean(x, mask)
        y = nn.Dense(channels // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(channels, name="fc2")(y)
        return x * jax.nn.sigmoid(y)[:, None, :]


class _JasperBlock(nn.Module):
    """One ConvASREncoder block (nemo jasper.py JasperBlock, stride 1).

    repeat x [masked (separable) conv -> BN -> (ReLU between repeats)],
    then SE, then the 1x1-conv+BN residual of the block INPUT, then the
    final ReLU — NeMo applies SE before the residual add and the last
    activation after it.
    """

    filters: int
    repeat: int = 1
    kernel: int = 3
    dilation: int = 1
    residual: bool = False
    separable: bool = True
    se: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.9, epsilon=1e-5, name=name)

        pad = self.dilation * (self.kernel - 1) // 2
        out = x
        for r in range(self.repeat):
            if mask is not None:
                out = out * mask       # MaskedConv1d zero-fill semantics
            if self.separable:
                out = nn.Conv(out.shape[-1], (self.kernel,),
                              kernel_dilation=(self.dilation,),
                              padding=[(pad, pad)],
                              feature_group_count=out.shape[-1],
                              use_bias=False, name=f"dw_{r}")(out)
                out = nn.Conv(self.filters, (1,), use_bias=False,
                              name=f"pw_{r}")(out)
            else:
                out = nn.Conv(self.filters, (self.kernel,),
                              kernel_dilation=(self.dilation,),
                              padding=[(pad, pad)], use_bias=False,
                              name=f"conv_{r}")(out)
            out = bn(f"bn_{r}")(out)
            if r != self.repeat - 1:
                out = nn.relu(out)
        if self.se:
            out = _NemoSE(name="se")(out, mask)
        if self.residual:
            res = x if mask is None else x * mask
            res = nn.Conv(self.filters, (1,), use_bias=False,
                          name="res_conv")(res)
            res = bn("res_bn")(res)
            out = out + res
        return nn.relu(out)


class _AttentivePool(nn.Module):
    """AttentivePoolLayer (nemo speaker_modules): TDNN attention over
    the [x, mean, std] global context, masked softmax over time, then
    attention-weighted mean/std stats -> (B, 2C)."""

    attention_channels: int = 128
    eps: float = 1e-10

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        if mask is None:
            mask = jnp.ones(x.shape[:2] + (1,), x.dtype)
        w = mask / jnp.maximum(mask.sum(axis=1, keepdims=True), 1.0)
        mean = (x * w).sum(axis=1, keepdims=True)
        std = jnp.sqrt(jnp.clip(
            (jnp.square(x - mean) * w).sum(axis=1, keepdims=True),
            self.eps, None))
        context = jnp.concatenate(
            [x, jnp.broadcast_to(mean, x.shape),
             jnp.broadcast_to(std, x.shape)], axis=-1)
        # TDNNModule: conv -> ReLU -> BatchNorm
        a = nn.Conv(self.attention_channels, (1,), name="tdnn_conv")(
            context)
        a = nn.relu(a)
        a = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="tdnn_bn")(a)
        a = jnp.tanh(a)
        a = nn.Conv(x.shape[-1], (1,), name="attn_conv")(a)
        a = jnp.where(mask > 0, a, -jnp.inf)
        alpha = jax.nn.softmax(a, axis=1)
        mu = (alpha * x).sum(axis=1)
        sg = jnp.sqrt(jnp.clip(
            (alpha * jnp.square(x - mu[:, None, :])).sum(axis=1),
            self.eps, None))
        return jnp.concatenate([mu, sg], axis=-1)


class TitaNetModule(nn.Module):
    """Mel features (B, T, n_mels) [+ (B, T, 1) mask] -> (B, emb_dim)."""

    n_mels: int = 80
    blocks: Sequence[dict] = tuple(dict(b) for b in TITANET_LARGE_BLOCKS)
    emb_dim: int = 192
    attention_channels: int = 128

    @nn.compact
    def __call__(self, feats: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        if mask is not None and mask.ndim == 2:
            mask = mask[..., None]
        x = feats if mask is None else feats * mask
        for i, cfg in enumerate(self.blocks):
            x = _JasperBlock(
                filters=int(cfg["filters"]),
                repeat=int(cfg.get("repeat", 1)),
                kernel=int(cfg["kernel"]),
                dilation=int(cfg.get("dilation", 1)),
                residual=bool(cfg.get("residual", False)),
                separable=bool(cfg.get("separable", False)),
                se=bool(cfg.get("se", True)),
                name=f"block_{i}")(x, mask, train=train)
        pooled = _AttentivePool(
            attention_channels=self.attention_channels,
            name="pool")(x, mask, train=train)
        # SpeakerDecoder 'conv' affine layer: BatchNorm1d -> 1x1 conv
        pooled = nn.BatchNorm(use_running_average=not train,
                              momentum=0.9, epsilon=1e-5,
                              name="emb_bn")(pooled)
        return nn.Dense(self.emb_dim, name="emb")(pooled)


class TitaNet(Model):
    """Native TitaNet with `.nemo` checkpoint conversion.

    Defaults match nvidia/speakerverification_en_titanet_large. The
    encoder block list follows the `.nemo` ``model_config.yaml`` when
    loading a real checkpoint (``from_nemo``), so TitaNet-small/medium
    configs convert through the same class.
    """

    def __init__(self, sample_rate: int = 16000, num_channels: int = 1,
                 n_mels: int = 80,
                 blocks: Optional[Sequence[dict]] = None,
                 emb_dim: int = 192, attention_channels: int = 128,
                 n_fft: int = 512, win_length: int = 400,
                 hop_length: int = 160,
                 task=None, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        self.n_mels = n_mels
        # accept NeMo config-style blocks too (kernel/dilation wrapped
        # in one-element lists) so callers can hand the yaml's jasper
        # entries straight in
        def norm(b):
            b = dict(b)
            for key in ("kernel", "dilation", "stride"):
                v = b.get(key)
                if isinstance(v, (list, tuple)):
                    b[key] = v[0]
            # conv weight shapes do not encode stride, so a strided
            # ConvASREncoder config would convert cleanly and run at the
            # wrong frame rate — refuse loudly instead
            stride = b.pop("stride", 1)
            if int(stride) != 1:
                raise ValueError(
                    "only stride-1 ConvASREncoder blocks are supported "
                    f"(TitaNet layout); got stride={stride}")
            return b

        self.blocks = [norm(b) for b in (blocks or TITANET_LARGE_BLOCKS)]
        self.emb_dim = emb_dim
        self.attention_channels = attention_channels
        self.n_fft = n_fft
        self.win_length = win_length
        self.hop_length = hop_length
        self.hparams = {"n_mels": n_mels, "blocks": self.blocks,
                        "emb_dim": emb_dim,
                        "attention_channels": attention_channels,
                        "n_fft": n_fft, "win_length": win_length,
                        "hop_length": hop_length}
        if self._specifications is None and task is None:
            self._specifications = Specifications(
                problem=Problem.REPRESENTATION,
                resolution=Resolution.CHUNK,
                duration=5.0, min_duration=0.5)

    def build_module(self) -> nn.Module:
        return TitaNetModule(
            n_mels=self.n_mels,
            blocks=tuple(dict(b) for b in self.blocks),
            emb_dim=self.emb_dim,
            attention_channels=self.attention_channels)

    def example_input_array(self) -> jnp.ndarray:
        # module input is mel features, not raw audio
        return jnp.zeros((1, 101, self.n_mels), jnp.float32)

    @property
    def dimension(self) -> int:
        return self.emb_dim

    def num_frames(self, num_samples: int) -> int:
        return nemo_mel_num_frames(num_samples, self.hop_length)

    @property
    def min_num_samples(self) -> int:
        """The reference's NeMo wrapper bisects its bound from runtime
        failures (speaker_verification.py:109-131), landing around
        0.1-0.5 s for titanet_large; our native forward is total, so a
        1-hop floor would happily embed 10-30 ms compacted slivers (1-2
        mel frames of near-garbage) that the upstream pipeline would
        instead mark NaN and exclude from clustering. Match that
        behavior with a 4x win_length floor (0.1 s at 16 kHz = the low
        end of the bisected boundary): shorter rows NaN out like the
        reference."""
        return 4 * self.win_length

    # -- forward ----------------------------------------------------------

    def __call__(self, waveforms, weights=None):
        """(batch, [1,] samples) [+ (batch, frames) weights] -> (B, dim)."""
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
        if mask is None:
            feats = nemo_mel_spectrogram(waveforms, n_mels=self.n_mels,
                                         sample_rate=self.sample_rate,
                                         n_fft=self.n_fft,
                                         win_length=self.win_length,
                                         hop_length=self.hop_length)
            return self.module.apply(params, feats)
        # scattered frame mask (pipeline weights): the normalization
        # statistics and every masked conv/pool see only masked frames
        feats = nemo_mel_spectrogram(waveforms, n_mels=self.n_mels,
                                     sample_rate=self.sample_rate,
                                     n_fft=self.n_fft,
                                     win_length=self.win_length,
                                     hop_length=self.hop_length,
                                     frame_mask=mask)
        return self.module.apply(params, feats, mask=mask)

    def forward_with_frame_mask(self, signals, frame_mask):
        """(B, samples) compacted signals + (B, mel frames) binary mask
        -> (B, dim): the NeMo-wrapper entry point (masked path)."""
        if self.module is None:
            self.build()
        if self._jitted_masked is None:
            self._jitted_masked = jax.jit(self._forward_masked)
        return self._jitted_masked(self.params,
                                   jnp.asarray(signals, jnp.float32),
                                   jnp.asarray(frame_mask, jnp.float32))

    _jitted_masked = None

    def _forward_masked(self, params, signals, frame_mask):
        feats = nemo_mel_spectrogram(signals, n_mels=self.n_mels,
                                     sample_rate=self.sample_rate,
                                     n_fft=self.n_fft,
                                     win_length=self.win_length,
                                     hop_length=self.hop_length,
                                     frame_mask=frame_mask)
        return self.module.apply(params, feats, mask=frame_mask)

    # -- .nemo conversion ---------------------------------------------------

    def convert_nemo_state_dict(self, state: Dict[str, np.ndarray]
                                ) -> Dict:
        """NeMo EncDecSpeakerLabelModel state dict -> flax variables.

        Layout (nemo jasper.py / speaker_modules.py):
          encoder.encoder.{i}.mconv.{j}.conv.weight   conv sub-layers
          encoder.encoder.{i}.mconv.{j}.{bn stats}    batch norms
          encoder.encoder.{i}.mconv.{j}.fc.{0,2}.*    squeeze-excite
          encoder.encoder.{i}.res.0.{0,1}.*           residual conv+bn
          decoder._pooling.attention_layer.{0,2}.*    attentive pooling
          decoder.emb_layers.0.{0,1}.*                BN + 1x1 conv
          decoder.final.*                             dropped (classifier)
        The mconv sub-layer indices are parsed, not assumed, so repeat
        counts / separability differences between TitaNet sizes all map.
        """
        import re

        state = {k: np.asarray(v) for k, v in state.items()}
        params: Dict = {}
        stats: Dict = {}

        def bn_entry(prefix):
            return ({"scale": state[f"{prefix}.weight"].astype(np.float32),
                     "bias": state[f"{prefix}.bias"].astype(np.float32)},
                    {"mean": state[f"{prefix}.running_mean"].astype(
                        np.float32),
                     "var": state[f"{prefix}.running_var"].astype(
                         np.float32)})

        def conv_kernel(w):
            w = w.astype(np.float32)
            return w.transpose(2, 1, 0)        # (O, I, k) -> (k, I, O)

        for i, cfg in enumerate(self.blocks):
            prefix = f"encoder.encoder.{i}"
            block_p: Dict = {}
            block_s: Dict = {}
            def mconv_ids(pattern, prefix=prefix):
                return sorted(
                    int(m.group(1)) for m in
                    (re.fullmatch(pattern, k[len(prefix) + 1:])
                     for k in state
                     if k.startswith(prefix + ".mconv.")) if m)

            conv_ids = mconv_ids(r"mconv\.(\d+)\.conv\.weight")
            separable = bool(cfg.get("separable", False))
            per_repeat = 2 if separable else 1
            repeat = int(cfg.get("repeat", 1))
            if len(conv_ids) != per_repeat * repeat:
                raise ValueError(
                    f"block {i}: found {len(conv_ids)} convs, expected "
                    f"{per_repeat * repeat} (separable={separable}, "
                    f"repeat={repeat})")
            bn_ids = mconv_ids(r"mconv\.(\d+)\.weight")
            se_ids = mconv_ids(r"mconv\.(\d+)\.fc\.0\.weight")
            if len(bn_ids) != repeat:
                raise ValueError(
                    f"block {i}: found {len(bn_ids)} batch norms, "
                    f"expected {repeat}")
            for r in range(repeat):
                if separable:
                    dw = conv_ids[2 * r]
                    pw = conv_ids[2 * r + 1]
                    block_p[f"dw_{r}"] = {"kernel": conv_kernel(
                        state[f"{prefix}.mconv.{dw}.conv.weight"])}
                    block_p[f"pw_{r}"] = {"kernel": conv_kernel(
                        state[f"{prefix}.mconv.{pw}.conv.weight"])}
                else:
                    cid = conv_ids[r]
                    block_p[f"conv_{r}"] = {"kernel": conv_kernel(
                        state[f"{prefix}.mconv.{cid}.conv.weight"])}
                p, s = bn_entry(f"{prefix}.mconv.{bn_ids[r]}")
                block_p[f"bn_{r}"] = p
                block_s[f"bn_{r}"] = s
            if cfg.get("se", True):
                if not se_ids:
                    raise ValueError(f"block {i}: missing SE weights")
                se = se_ids[0]
                block_p["se"] = {
                    "fc1": {
                        "kernel": state[
                            f"{prefix}.mconv.{se}.fc.0.weight"
                        ].astype(np.float32).T,
                        "bias": state[
                            f"{prefix}.mconv.{se}.fc.0.bias"
                        ].astype(np.float32)},
                    "fc2": {
                        "kernel": state[
                            f"{prefix}.mconv.{se}.fc.2.weight"
                        ].astype(np.float32).T,
                        "bias": state[
                            f"{prefix}.mconv.{se}.fc.2.bias"
                        ].astype(np.float32)},
                }
            if cfg.get("residual", False):
                block_p["res_conv"] = {"kernel": conv_kernel(
                    state[f"{prefix}.res.0.0.conv.weight"])}
                p, s = bn_entry(f"{prefix}.res.0.1")
                block_p["res_bn"] = p
                block_s["res_bn"] = s
            params[f"block_{i}"] = block_p
            if block_s:
                stats[f"block_{i}"] = block_s

        pool = "decoder._pooling.attention_layer"
        pool_p = {
            "tdnn_conv": {
                "kernel": conv_kernel(state[f"{pool}.0.conv_layer.weight"]),
                "bias": state[f"{pool}.0.conv_layer.bias"].astype(
                    np.float32)},
            "attn_conv": {
                "kernel": conv_kernel(state[f"{pool}.2.weight"]),
                "bias": state[f"{pool}.2.bias"].astype(np.float32)},
        }
        p, s = bn_entry(f"{pool}.0.bn")
        pool_p["tdnn_bn"] = p
        params["pool"] = pool_p
        stats["pool"] = {"tdnn_bn": s}

        p, s = bn_entry("decoder.emb_layers.0.0")
        params["emb_bn"] = p
        stats["emb_bn"] = s
        emb_w = state["decoder.emb_layers.0.1.weight"].astype(np.float32)
        params["emb"] = {"kernel": emb_w[:, :, 0].T,
                         "bias": state["decoder.emb_layers.0.1.bias"]
                         .astype(np.float32)}
        return {"params": params, "batch_stats": stats}

    convert_torch_state_dict = convert_nemo_state_dict

    def export_torch_state_dict(self) -> Dict[str, np.ndarray]:
        """NeMo-layout state dict (utils/torch_export plain-dict path;
        for a loadable archive use :func:`export_nemo_checkpoint`)."""
        return export_nemo_state_dict(self)

    @classmethod
    def from_nemo(cls, source: Union[str, Path], revision=None,
                  token=None, cache_dir=None) -> "TitaNet":
        """Load a `.nemo` archive / extracted dir / hub id.

        ``source`` may be: a local ``.nemo`` tar, a directory containing
        ``model_config.yaml`` + ``model_weights.ckpt``, or a hub id like
        "nvidia/speakerverification_en_titanet_large" (the ``.nemo``
        asset is resolved through utils/hf_hub like every other
        checkpoint).
        """
        config, state = _load_nemo_archive(source, revision=revision,
                                           token=token,
                                           cache_dir=cache_dir)
        kwargs = _model_kwargs_from_config(config)
        model = cls(**kwargs)
        model.build()
        model.params = model.convert_nemo_state_dict(state)
        model._jitted_apply = None
        return model


def _model_kwargs_from_config(config: Dict) -> Dict:
    """model_config.yaml -> TitaNet constructor kwargs."""
    pre = config.get("preprocessor", {}) or {}
    enc = config.get("encoder", {}) or {}
    dec = config.get("decoder", {}) or {}
    blocks = []
    for blk in enc.get("jasper", []) or []:
        kernel = blk.get("kernel", [3])
        dilation = blk.get("dilation", [1])
        stride = blk.get("stride", [1])
        blocks.append(dict(
            filters=int(blk["filters"]),
            repeat=int(blk.get("repeat", 1)),
            kernel=int(kernel[0] if isinstance(kernel, (list, tuple))
                       else kernel),
            dilation=int(dilation[0]
                         if isinstance(dilation, (list, tuple))
                         else dilation),
            # carried through so TitaNet.__init__'s norm() can refuse
            # strided ConvASREncoder configs (conv weight SHAPES do not
            # encode stride, so a strided .nemo would otherwise convert
            # cleanly and silently run at the wrong frame rate)
            stride=int(stride[0] if isinstance(stride, (list, tuple))
                       else stride),
            residual=bool(blk.get("residual", False)),
            separable=bool(blk.get("separable", False)),
            se=bool(blk.get("se", True))))
    emb_sizes = dec.get("emb_sizes", 192)
    if isinstance(emb_sizes, (list, tuple)):
        emb_sizes = emb_sizes[0]
    sample_rate = int(pre.get("sample_rate", 16000))
    window = str(pre.get("window", "hann")).lower()
    if window != "hann":
        raise ValueError(
            f"unsupported preprocessor window {window!r} (only 'hann' "
            "— the TitaNet family default — is implemented)")
    normalize = pre.get("normalize", "per_feature")
    if normalize not in ("per_feature",):
        raise ValueError(
            f"unsupported preprocessor normalize {normalize!r}")
    win_length = int(round(float(pre.get("window_size", 0.025))
                           * sample_rate))
    hop_length = int(round(float(pre.get("window_stride", 0.01))
                           * sample_rate))
    n_fft = int(pre.get("n_fft") or _next_pow2(win_length))
    kwargs = {
        "sample_rate": sample_rate,
        "n_mels": int(pre.get("features", 80)),
        "emb_dim": int(emb_sizes),
        "attention_channels": int(dec.get("attention_channels", 128)),
        "n_fft": n_fft,
        "win_length": win_length,
        "hop_length": hop_length,
    }
    if blocks:
        kwargs["blocks"] = blocks
    return kwargs


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _load_nemo_archive(source: Union[str, Path], revision=None,
                       token=None, cache_dir=None):
    """Resolve + parse a .nemo archive -> (config dict, state dict)."""
    import yaml

    path = Path(source)
    if not path.exists() and isinstance(source, str) \
            and source.count("/") == 1 and not source.endswith(".nemo"):
        # hub id: the .nemo asset is named after the repo
        from ...utils.hf_hub import download_from_hf_hub
        name = source.split("/", 1)[1] + ".nemo"
        path = Path(download_from_hf_hub(
            source, name, revision=revision, token=token,
            cache_dir=cache_dir))
    if not path.exists():
        raise FileNotFoundError(f"no .nemo checkpoint at {source!r}")

    if path.is_dir():
        config_bytes = (path / "model_config.yaml").read_bytes()
        weights_path = path / "model_weights.ckpt"
        state = _torch_load(weights_path.read_bytes())
    else:
        with tarfile.open(path, "r:*") as tar:
            names = tar.getnames()

            def member(suffix):
                # exact basename match: accepts NeMo's './'-prefixed
                # members while rejecting hidden/AppleDouble entries
                # like '._model_weights.ckpt' from repacked archives
                for n in names:
                    if n.rsplit("/", 1)[-1] == suffix:
                        return n
                raise FileNotFoundError(
                    f"{suffix} not found in {path} (members: "
                    f"{names[:10]}...)")

            config_bytes = tar.extractfile(
                member("model_config.yaml")).read()
            state = _torch_load(
                tar.extractfile(member("model_weights.ckpt")).read())
    config = yaml.safe_load(config_bytes)
    return config, state


def _torch_load(data: bytes) -> Dict[str, np.ndarray]:
    import torch

    state = torch.load(io.BytesIO(data), map_location="cpu",
                       weights_only=True)
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in state.items()}


def _mconv_layout(cfg: Dict) -> Dict[str, int]:
    """NeMo JasperBlock mconv ModuleList indices for one block config:
    per repeat [conv(s), BN] with [activation, dropout] placeholders
    BETWEEN repeats, SqueezeExcite appended last (jasper.py ordering —
    the placeholders own no params but occupy indices)."""
    layout: Dict[str, int] = {}
    idx = 0
    repeat = int(cfg.get("repeat", 1))
    for r in range(repeat):
        if cfg.get("separable", False):
            layout[f"dw_{r}"] = idx
            layout[f"pw_{r}"] = idx + 1
            layout[f"bn_{r}"] = idx + 2
            idx += 3
        else:
            layout[f"conv_{r}"] = idx
            layout[f"bn_{r}"] = idx + 1
            idx += 2
        if r != repeat - 1:
            idx += 2                      # activation + dropout
    if cfg.get("se", True):
        layout["se"] = idx
    return layout


def export_nemo_state_dict(model: "TitaNet") -> Dict[str, np.ndarray]:
    """Inverse of :meth:`TitaNet.convert_nemo_state_dict`: flax params ->
    the exact NeMo ``EncDecSpeakerLabelModel`` state-dict layout
    (loadable by nemo_toolkit, classification head zero-initialized —
    NeMo keeps it for fine-tuning but embeddings never touch it)."""
    variables = model.params
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def a(x):
        return np.asarray(x, dtype=np.float32)

    state: Dict[str, np.ndarray] = {}

    def put_bn(prefix, p, s):
        state[f"{prefix}.weight"] = a(p["scale"])
        state[f"{prefix}.bias"] = a(p["bias"])
        state[f"{prefix}.running_mean"] = a(s["mean"])
        state[f"{prefix}.running_var"] = a(s["var"])
        state[f"{prefix}.num_batches_tracked"] = np.asarray(
            0, dtype=np.int64)

    def put_conv(key, kernel, bias=None):
        # flax (k, I, O) -> torch (O, I, k)
        state[f"{key}.weight"] = a(kernel).transpose(2, 1, 0)
        if bias is not None:
            state[f"{key}.bias"] = a(bias)

    for i, cfg in enumerate(model.blocks):
        prefix = f"encoder.encoder.{i}"
        bp = params[f"block_{i}"]
        bs = stats.get(f"block_{i}", {})
        layout = _mconv_layout(cfg)
        for name, idx in layout.items():
            if name.startswith("bn_"):
                put_bn(f"{prefix}.mconv.{idx}", bp[name], bs[name])
            elif name == "se":
                state[f"{prefix}.mconv.{idx}.fc.0.weight"] = \
                    a(bp["se"]["fc1"]["kernel"]).T
                state[f"{prefix}.mconv.{idx}.fc.0.bias"] = \
                    a(bp["se"]["fc1"]["bias"])
                state[f"{prefix}.mconv.{idx}.fc.2.weight"] = \
                    a(bp["se"]["fc2"]["kernel"]).T
                state[f"{prefix}.mconv.{idx}.fc.2.bias"] = \
                    a(bp["se"]["fc2"]["bias"])
            else:
                put_conv(f"{prefix}.mconv.{idx}.conv",
                         bp[name]["kernel"])
        if cfg.get("residual", False):
            put_conv(f"{prefix}.res.0.0.conv", bp["res_conv"]["kernel"])
            put_bn(f"{prefix}.res.0.1", bp["res_bn"], bs["res_bn"])

    pool = "decoder._pooling.attention_layer"
    put_conv(f"{pool}.0.conv_layer", params["pool"]["tdnn_conv"]["kernel"],
             params["pool"]["tdnn_conv"]["bias"])
    put_bn(f"{pool}.0.bn", params["pool"]["tdnn_bn"],
           stats["pool"]["tdnn_bn"])
    put_conv(f"{pool}.2", params["pool"]["attn_conv"]["kernel"],
             params["pool"]["attn_conv"]["bias"])
    put_bn("decoder.emb_layers.0.0", params["emb_bn"], stats["emb_bn"])
    # 1x1 conv: flax Dense kernel (2C, emb) -> torch (emb, 2C, 1)
    state["decoder.emb_layers.0.1.weight"] = \
        a(params["emb"]["kernel"]).T[:, :, None]
    state["decoder.emb_layers.0.1.bias"] = a(params["emb"]["bias"])
    # classification head: training-only, not represented in flax
    state["decoder.final.weight"] = np.zeros(
        (7, model.emb_dim), dtype=np.float32)
    return state


def export_nemo_checkpoint(model: "TitaNet",
                           path: Union[str, Path]) -> Path:
    """Write ``model`` as a loadable ``.nemo`` archive (tar with
    model_config.yaml + model_weights.ckpt) — the inverse of
    :meth:`TitaNet.from_nemo`, so TPU-trained TitaNets deploy on stock
    NeMo deployments."""
    import torch
    import yaml

    config = {
        "preprocessor": {"sample_rate": model.sample_rate,
                         "features": model.n_mels, "n_fft": model.n_fft,
                         "window_size": model.win_length
                         / model.sample_rate,
                         "window_stride": model.hop_length
                         / model.sample_rate,
                         "normalize": "per_feature", "window": "hann"},
        "encoder": {"feat_in": model.n_mels, "jasper": [
            {"filters": b["filters"], "repeat": b.get("repeat", 1),
             "kernel": [b["kernel"]], "stride": [1],
             "dilation": [b.get("dilation", 1)],
             "residual": b.get("residual", False),
             "separable": b.get("separable", False),
             "se": b.get("se", True), "se_context_size": -1}
            for b in model.blocks]},
        "decoder": {"feat_in": model.blocks[-1]["filters"],
                    "num_classes": 7, "pool_mode": "attention",
                    "emb_sizes": model.emb_dim,
                    "attention_channels": model.attention_channels,
                    "angular": True},
    }
    state = {k: torch.from_numpy(np.array(v, copy=True))
             for k, v in export_nemo_state_dict(model).items()}
    weights = io.BytesIO()
    torch.save(state, weights)
    path = Path(path)
    if path.is_dir() or path.suffix == "":
        path.mkdir(parents=True, exist_ok=True)
        path = path / "model.nemo"
    with tarfile.open(path, "w:gz") as tar:
        for name, payload in [
                ("./model_config.yaml",
                 yaml.safe_dump(config).encode()),
                ("./model_weights.ckpt", weights.getvalue())]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    return path
