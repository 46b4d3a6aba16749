"""ToTaToNet: joint speech separation + diarization (flax).

Parity: /root/reference/src/pyannote/audio/models/separation/ToTaToNet.py
(PixIT, Kalda et al., Odyssey 2024): free conv encoder (64 filters, k=32,
s=16) -> DPRNN masker (6 repeats) -> masked representation -> transposed
conv decoder to 3 sources, plus a diarization branch (avg-pool of the
masked representation at 125 fps -> linear stack -> per-source activity).

The reference's optional WavLM-large branch is supported three ways:
``use_wavlm=<path>`` builds the SSL encoder from a local torch WavLM
checkpoint (no egress here, so there is no automatic
microsoft/wavlm-large download); ``use_wavlm=True`` + ``wavlm_config``
rebuilds the branch from our own persisted checkpoints; and
``convert_torch_state_dict`` reconstructs the WavLM weights embedded in
a real reference PixIT checkpoint with no external download at all
(golden-tested in tests/test_torch_parity.py — checkpoint-embedded
WavLM roundtrip).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Resolution, Specifications
from ...utils.params import merge_dict
from ...utils.receptive_field import (conv1d_num_frames,
                                      conv1d_receptive_field_center,
                                      conv1d_receptive_field_size)
from ..blocks.dprnn import DPRNN
from ..blocks.ssl import SSLEncoder


class ToTaToNetModule(nn.Module):
    n_filters: int = 64
    kernel_size: int = 32
    stride: int = 16
    n_sources: int = 3
    dprnn_repeats: int = 6
    bn_chan: int = 128
    hid_size: int = 128
    chunk_size: int = 100
    linear_hidden: int = 64
    linear_layers: int = 2
    diarization_scaling: int = 8   # 16k / 125fps / stride 16
    # optional WavLM branch (reference ToTaToNet.py:179-196): SSL features
    # repeat-upsampled to the encoder frame rate and concatenated before
    # the masker
    use_wavlm: bool = False
    wavlm_hidden: int = 1024
    wavlm_layers: int = 24
    wavlm_heads: int = 16
    wavlm_ffn: int = 4096
    wavlm_conv_channels: int = 512
    wavlm_rel_pos_bias: bool = True
    wavlm_pre_ln: bool = True      # wavlm-large is stable-layer-norm
    wavlm_conv_norm: str = "layer"
    wavlm_scaling: int = 20        # SSL stride 320 / encoder stride 16

    def setup(self):
        self.encoder = nn.Conv(self.n_filters, (self.kernel_size,),
                               strides=(self.stride,), padding="VALID",
                               use_bias=False)
        if self.use_wavlm:
            self.wavlm = SSLEncoder(hidden=self.wavlm_hidden,
                                    layers=self.wavlm_layers,
                                    heads=self.wavlm_heads,
                                    ffn=self.wavlm_ffn,
                                    conv_channels=self.wavlm_conv_channels,
                                    rel_pos_bias=self.wavlm_rel_pos_bias,
                                    pre_ln=self.wavlm_pre_ln,
                                    conv_norm_mode=self.wavlm_conv_norm,
                                    name="wavlm")
        masker_in = self.n_filters + \
            (self.wavlm_hidden if self.use_wavlm else 0)
        self.masker = DPRNN(in_chan=masker_in,
                            out_chan=self.n_filters,
                            n_src=self.n_sources,
                            bn_chan=self.bn_chan,
                            hid_size=self.hid_size,
                            chunk_size=self.chunk_size,
                            n_repeats=self.dprnn_repeats)
        self.decoder = nn.ConvTranspose(1, (self.kernel_size,),
                                        strides=(self.stride,),
                                        padding="VALID", use_bias=False)
        self.linears = [nn.Dense(self.linear_hidden)
                        for _ in range(self.linear_layers)]
        self.classifier = nn.Dense(1)

    def __call__(self, waveforms: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(B, 1, samples) -> (diar (B, frames, n_src) sigmoid,
        sources (B, samples', n_src))."""
        B, _, T = waveforms.shape
        x = jnp.swapaxes(waveforms, 1, 2)        # (B, T, 1)
        rep = self.encoder(x)                     # (B, T', F)
        if self.use_wavlm:
            w = self.wavlm(waveforms)[-1]          # (B, Tw, H) last layer
            w = jnp.repeat(w, self.wavlm_scaling, axis=1)
            Tp = rep.shape[1]
            if w.shape[1] < Tp:
                w = jnp.pad(w, ((0, 0), (0, Tp - w.shape[1]), (0, 0)))
            else:
                w = w[:, :Tp]
            masks = self.masker(jnp.concatenate([rep, w], axis=-1))
        else:
            masks = self.masker(rep)              # (B, n_src, T', F)
        masked = masks * rep[:, None]             # (B, n_src, T', F)

        # decode each source back to a waveform
        dec_in = masked.reshape(B * self.n_sources, *masked.shape[2:])
        decoded = self.decoder(dec_in)            # (B*n_src, ~T, 1)
        decoded = decoded[..., 0].reshape(B, self.n_sources, -1)
        pad = T - decoded.shape[-1]
        if pad > 0:
            decoded = jnp.pad(decoded, ((0, 0), (0, 0), (0, pad)))
        else:
            decoded = decoded[..., :T]
        sources = jnp.transpose(decoded, (0, 2, 1))  # (B, T, n_src)

        # diarization branch: avg-pool masked reps to the diar frame rate
        d = dec_in                                   # (B*n_src, T', F)
        s = self.diarization_scaling
        Td = d.shape[1] // s
        d = d[:, :Td * s].reshape(d.shape[0], Td, s, d.shape[2]).mean(
            axis=2)                                  # (B*n_src, Td, F)
        h = d
        for linear in self.linears:
            h = nn.leaky_relu(linear(h), 0.01)
        if self.linear_layers == 0:
            h = jnp.sum(d ** 2, axis=-1, keepdims=True)
        scores = self.classifier(h)[..., 0]          # (B*n_src, Td)
        scores = scores.reshape(B, self.n_sources, Td)
        diar = nn.sigmoid(jnp.swapaxes(scores, 1, 2))  # (B, Td, n_src)
        return diar, sources


class ToTaToNet(Model):
    """Parity: ToTaToNet (reference ToTaToNet.py:60-360)."""

    ENCODER_DECODER_DEFAULTS = {"fb_name": "free", "kernel_size": 32,
                                "n_filters": 64, "stride": 16}
    LINEAR_DEFAULTS = {"hidden_size": 64, "num_layers": 2}
    DPRNN_DEFAULTS = {"n_repeats": 6, "bn_chan": 128, "hid_size": 128,
                      "chunk_size": 100, "norm_type": "gLN",
                      "mask_act": "relu", "rnn_type": "LSTM"}
    DIAR_DEFAULTS = {"frames_per_second": 125}

    def __init__(self, encoder_decoder: Optional[dict] = None,
                 linear: Optional[dict] = None,
                 diar: Optional[dict] = None,
                 dprnn: Optional[dict] = None,
                 sample_rate: int = 16000, num_channels: int = 1,
                 task=None, n_sources: int = 3,
                 use_wavlm=False, wavlm_frozen: bool = False,
                 wavlm_config: Optional[dict] = None,
                 gradient_clip_val: float = 5.0, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        # use_wavlm: False, or a local torch WavLM checkpoint path/dir
        # (reference downloads microsoft/wavlm-large, ToTaToNet.py:180;
        # no egress here, so the weights must be local). use_wavlm=True
        # is valid only with an explicit wavlm_config — the layout our
        # own checkpoints persist after reconstructing the branch from a
        # real PixIT checkpoint (weights then come from params.msgpack).
        self._wavlm_state = None
        self.wavlm_config = dict(wavlm_config) if wavlm_config else None
        if use_wavlm is True and self.wavlm_config is None:
            raise NotImplementedError(
                "the WavLM branch needs a local WavLM checkpoint "
                "(no model downloads in this environment); pass "
                "use_wavlm=<path to torch checkpoint> or use_wavlm=False")
        if use_wavlm and use_wavlm is not True:
            from ..segmentation.sseriouss import (_infer_ssl_config,
                                                  _load_torch_ssl_state)
            self._wavlm_state = _load_torch_ssl_state(use_wavlm)
            self.wavlm_config = _infer_ssl_config(self._wavlm_state)
        self.use_wavlm = bool(use_wavlm)
        self.wavlm_frozen = wavlm_frozen
        self.encoder_decoder = merge_dict(self.ENCODER_DECODER_DEFAULTS,
                                          encoder_decoder)
        self.linear = merge_dict(self.LINEAR_DEFAULTS, linear)
        self.dprnn = merge_dict(self.DPRNN_DEFAULTS, dprnn)
        self.diar = merge_dict(self.DIAR_DEFAULTS, diar)
        self.n_sources = n_sources
        self.hparams = {"encoder_decoder": self.encoder_decoder,
                        "linear": self.linear, "dprnn": self.dprnn,
                        "diar": self.diar, "n_sources": n_sources,
                        "use_wavlm": self.use_wavlm,
                        "wavlm_frozen": wavlm_frozen}
        if self.wavlm_config is not None:
            # persisted so save_checkpoint -> from_pretrained can rebuild
            # the WavLM branch without any external checkpoint (weights
            # live in params.msgpack)
            self.hparams["wavlm_config"] = dict(self.wavlm_config)
        self.diarization_scaling = int(
            sample_rate / self.diar["frames_per_second"]
            / self.encoder_decoder["stride"])
        if self._specifications is None and task is None:
            self._specifications = (
                Specifications(problem=Problem.MULTI_LABEL_CLASSIFICATION,
                               resolution=Resolution.FRAME, duration=5.0,
                               classes=[f"speaker#{i+1}"
                                        for i in range(n_sources)],
                               permutation_invariant=True),
                Specifications(problem=Problem.REGRESSION,
                               resolution=Resolution.FRAME, duration=5.0,
                               classes=[f"source#{i+1}"
                                        for i in range(n_sources)],
                               permutation_invariant=True),
            )

    def build_module(self) -> nn.Module:
        return ToTaToNetModule(
            n_filters=self.encoder_decoder["n_filters"],
            kernel_size=self.encoder_decoder["kernel_size"],
            stride=self.encoder_decoder["stride"],
            n_sources=self.n_sources,
            dprnn_repeats=self.dprnn["n_repeats"],
            bn_chan=self.dprnn["bn_chan"],
            hid_size=self.dprnn["hid_size"],
            chunk_size=self.dprnn["chunk_size"],
            linear_hidden=self.linear["hidden_size"],
            linear_layers=self.linear["num_layers"],
            diarization_scaling=self.diarization_scaling,
            use_wavlm=self.use_wavlm,
            **({"wavlm_hidden": self.wavlm_config["hidden"],
                "wavlm_layers": self.wavlm_config["layers"],
                "wavlm_heads": self.wavlm_config["heads"],
                "wavlm_ffn": self.wavlm_config["ffn"],
                "wavlm_conv_channels": self.wavlm_config["conv_channels"],
                "wavlm_rel_pos_bias": self.wavlm_config["rel_pos_bias"],
                "wavlm_pre_ln": self.wavlm_config.get("pre_ln", True),
                "wavlm_conv_norm": self.wavlm_config.get("conv_norm",
                                                         "layer"),
                "wavlm_scaling":
                    320 // self.encoder_decoder["stride"]}
               if self.wavlm_config else {}),
        )

    def build(self, rng=None) -> "ToTaToNet":
        had_params = self.params is not None
        super().build(rng)
        if self._wavlm_state is not None and not had_params:
            from ..blocks.ssl import convert_torch_wav2vec2
            from ..segmentation.sseriouss import _merge_trunk
            trunk = convert_torch_wav2vec2(
                self._wavlm_state, layers=self.wavlm_config["layers"])
            params = jax.tree_util.tree_map(lambda x: x, self.params)
            params["params"]["wavlm"] = jax.tree_util.tree_map(
                jnp.asarray,
                _merge_trunk(params["params"]["wavlm"], trunk))
            self.params = params
            self._jitted_apply = None
        return self

    def frozen_mask_prefixes(self):
        return ["wavlm"] if (self.use_wavlm and self.wavlm_frozen) else []

    @property
    def dimension(self) -> int:
        return 1

    def _equivalent_conv(self) -> Dict[str, int]:
        stride = self.diarization_scaling * self.encoder_decoder["stride"]
        kernel = self.diarization_scaling * \
            self.encoder_decoder["kernel_size"]
        return {"kernel_size": kernel, "stride": stride}

    # -- torch conversion -------------------------------------------------

    def convert_torch_state_dict(self, state: Dict[str, np.ndarray]):
        """Map a reference ToTaToNet state_dict onto our param pytree.

        Reference layout (ToTaToNet.py:175-237): asteroid free-filterbank
        ``encoder/decoder.filterbank._filters`` (n_filters, 1, k);
        asteroid DPRNN ``masker.*`` (bottleneck = gLN + 1x1 conv, per
        repeat intra/inter SingleRNN + linear + gLN, ``first_out`` =
        PReLU + 1x1 conv2d to n_src*bn_chan, post-fold ``net_out`` /
        ``net_gate`` bn_chan-wide 1x1 convs + bias-free ``mask_net``
        out-projection); ``linear.{i}`` + ``classifier`` heads.
        WavLM weights (``wavlm.*``) are loaded separately through the SSL
        checkpoint path (build(), blocks/ssl.py), not through this
        converter.
        """

        def get(name):
            return np.asarray(state[name], dtype=np.float32)

        # a real PixIT checkpoint embeds the fine-tuned WavLM itself
        # (reference default use_wavlm=True; AutoModel weights live under
        # "wavlm." in HF layout). Reconstruct the branch from the
        # checkpoint: infer the config, rebuild the module with the
        # wider masker, and convert the embedded weights — no external
        # WavLM download needed.
        wavlm_state = {k[len("wavlm."):]: v for k, v in state.items()
                       if k.startswith("wavlm.")}
        if wavlm_state and not self.use_wavlm:
            from ..segmentation.sseriouss import _infer_ssl_config
            self.wavlm_config = _infer_ssl_config(wavlm_state)
            self.use_wavlm = True
            self.hparams["use_wavlm"] = True
            self.hparams["wavlm_config"] = dict(self.wavlm_config)
            self.module = self.build_module()
            self.params = None
            self._jitted_apply = None

        params: Dict = {}
        # asteroid Encoder: conv1d(waveform, _filters, stride), no bias.
        # torch (out=n_filters, in=1, k) -> flax kernel (k, 1, n_filters)
        params["encoder"] = {"kernel": get(
            "encoder.filterbank._filters").transpose(2, 1, 0)}
        # asteroid Decoder: F.conv_transpose1d(x, _filters, stride) with
        # torch layout (in=n_filters, out=1, k). flax ConvTranspose
        # cross-correlates the un-flipped kernel over the dilated input,
        # so the torch kernel must be spatially REVERSED: (k, in, out)
        # with k axis flipped.
        params["decoder"] = {"kernel": get(
            "decoder.filterbank._filters").transpose(2, 0, 1)[::-1]}

        m: Dict = {}
        m["in_norm"] = {
            "scale": get("masker.bottleneck.0.gamma").reshape(-1),
            "bias": get("masker.bottleneck.0.beta").reshape(-1)}
        m["bottleneck"] = {
            "kernel": get("masker.bottleneck.1.weight")[..., 0].T,
            "bias": get("masker.bottleneck.1.bias")}
        for r in range(self.dprnn["n_repeats"]):
            blk: Dict = {}
            for which in ("intra", "inter"):
                ref = f"masker.net.{r}.{which}_RNN.rnn"
                rnn: Dict = {}
                for kind in ("weight_ih", "weight_hh", "bias_ih",
                             "bias_hh"):
                    ours = kind.replace("weight_", "w_").replace(
                        "bias_", "b_")
                    rnn[f"{ours}_l0"] = get(f"{ref}.{kind}_l0")
                    rnn[f"{ours}_l0_reverse"] = get(
                        f"{ref}.{kind}_l0_reverse")
                blk[f"{which}_rnn"] = rnn
                blk[f"{which}_linear"] = {
                    "kernel": get(f"masker.net.{r}.{which}_linear.weight"
                                  ).T,
                    "bias": get(f"masker.net.{r}.{which}_linear.bias")}
                blk[f"{which}_norm"] = {
                    "scale": get(f"masker.net.{r}.{which}_norm.gamma"
                                 ).reshape(-1),
                    "bias": get(f"masker.net.{r}.{which}_norm.beta"
                                ).reshape(-1)}
            m[f"block_{r}"] = blk
        m["mask_prelu"] = {"negative_slope": get(
            "masker.first_out.0.weight").reshape(())}
        m["first_out"] = {
            "kernel": get("masker.first_out.1.weight")[..., 0, 0].T,
            "bias": get("masker.first_out.1.bias")}
        m["net_out"] = {
            "kernel": get("masker.net_out.0.weight")[..., 0].T,
            "bias": get("masker.net_out.0.bias")}
        m["net_gate"] = {
            "kernel": get("masker.net_gate.0.weight")[..., 0].T,
            "bias": get("masker.net_gate.0.bias")}
        # final bias-free Conv1d(bn_chan, out_chan, 1) after the gate
        m["mask_net"] = {
            "kernel": get("masker.mask_net.weight")[..., 0].T}
        params["masker"] = m

        for i in range(self.linear["num_layers"]):
            params[f"linears_{i}"] = {
                "kernel": get(f"linear.{i}.weight").T,
                "bias": get(f"linear.{i}.bias")}
        params["classifier"] = {"kernel": get("classifier.weight").T,
                                "bias": get("classifier.bias")}
        if wavlm_state and self.use_wavlm:
            from ..blocks.ssl import convert_torch_wav2vec2
            from ..segmentation.sseriouss import _merge_trunk
            trunk = convert_torch_wav2vec2(
                wavlm_state, layers=self.wavlm_config["layers"])
            # graft onto an initialized tree so module-declared params
            # the converter has no source for (unusual conv-bias / gate
            # combinations) keep their init instead of crashing apply
            if self.params is None:
                super().build()
            params["wavlm"] = _merge_trunk(
                jax.tree_util.tree_map(np.asarray,
                                       self.params["params"]["wavlm"]),
                trunk)
        elif self.use_wavlm and self.params is not None:
            # keep the WavLM branch loaded by build() from the local SSL
            # checkpoint (reference downloads microsoft/wavlm-large)
            params["wavlm"] = self.params["params"]["wavlm"]
        return {"params": params}

    #: reference import path for exported checkpoints
    REFERENCE_ARCHITECTURE = ("pyannote.audio.models.separation",
                              "ToTaToNet")

    def export_torch_state_dict(self) -> Dict[str, np.ndarray]:
        """Inverse of :meth:`convert_torch_state_dict`: asteroid
        filterbank/DPRNN layout (gLN gamma/beta in asteroid's (1, C, 1)
        shape) + heads, with ``wavlm.*`` in HF layout when the branch is
        active."""
        if self.params is None:
            raise ValueError("build or load the model before exporting")
        p = self.params["params"]
        a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
        state: Dict[str, np.ndarray] = {}
        state["encoder.filterbank._filters"] = a(
            p["encoder"]["kernel"]).transpose(2, 1, 0)
        # flax ConvTranspose kernel is the spatially-reversed torch
        # filter (see convert); flip back then restore (in, out, k)
        state["decoder.filterbank._filters"] = a(
            p["decoder"]["kernel"])[::-1].transpose(1, 2, 0)

        m = p["masker"]
        state["masker.bottleneck.0.gamma"] = a(
            m["in_norm"]["scale"]).reshape(1, -1, 1)
        state["masker.bottleneck.0.beta"] = a(
            m["in_norm"]["bias"]).reshape(1, -1, 1)
        state["masker.bottleneck.1.weight"] = a(
            m["bottleneck"]["kernel"]).T[..., None]
        state["masker.bottleneck.1.bias"] = a(m["bottleneck"]["bias"])
        for r in range(self.dprnn["n_repeats"]):
            blk = m[f"block_{r}"]
            for which in ("intra", "inter"):
                ref = f"masker.net.{r}.{which}_RNN.rnn"
                for kind in ("weight_ih", "weight_hh", "bias_ih",
                             "bias_hh"):
                    ours = kind.replace("weight_", "w_").replace(
                        "bias_", "b_")
                    state[f"{ref}.{kind}_l0"] = a(
                        blk[f"{which}_rnn"][f"{ours}_l0"])
                    state[f"{ref}.{kind}_l0_reverse"] = a(
                        blk[f"{which}_rnn"][f"{ours}_l0_reverse"])
                state[f"masker.net.{r}.{which}_linear.weight"] = a(
                    blk[f"{which}_linear"]["kernel"]).T
                state[f"masker.net.{r}.{which}_linear.bias"] = a(
                    blk[f"{which}_linear"]["bias"])
                state[f"masker.net.{r}.{which}_norm.gamma"] = a(
                    blk[f"{which}_norm"]["scale"]).reshape(1, -1, 1)
                state[f"masker.net.{r}.{which}_norm.beta"] = a(
                    blk[f"{which}_norm"]["bias"]).reshape(1, -1, 1)
        state["masker.first_out.0.weight"] = a(
            m["mask_prelu"]["negative_slope"]).reshape(1)
        state["masker.first_out.1.weight"] = a(
            m["first_out"]["kernel"]).T[..., None, None]
        state["masker.first_out.1.bias"] = a(m["first_out"]["bias"])
        for name in ("net_out", "net_gate"):
            state[f"masker.{name}.0.weight"] = a(
                m[name]["kernel"]).T[..., None]
            state[f"masker.{name}.0.bias"] = a(m[name]["bias"])
        state["masker.mask_net.weight"] = a(
            m["mask_net"]["kernel"]).T[..., None]

        for i in range(self.linear["num_layers"]):
            state[f"linear.{i}.weight"] = a(p[f"linears_{i}"]["kernel"]).T
            state[f"linear.{i}.bias"] = a(p[f"linears_{i}"]["bias"])
        state["classifier.weight"] = a(p["classifier"]["kernel"]).T
        state["classifier.bias"] = a(p["classifier"]["bias"])
        if self.use_wavlm and "wavlm" in p:
            from ..blocks.ssl import export_torch_wav2vec2
            state.update({
                f"wavlm.{key}": value for key, value in
                export_torch_wav2vec2(
                    p["wavlm"],
                    layers=self.wavlm_config["layers"]).items()})
        return state

    def num_frames(self, num_samples: int) -> int:
        eq = self._equivalent_conv()
        return conv1d_num_frames(num_samples, **eq)

    def receptive_field_size(self, num_frames: int = 1) -> int:
        eq = self._equivalent_conv()
        return conv1d_receptive_field_size(num_frames, **eq)

    def receptive_field_center(self, frame: int = 0) -> int:
        eq = self._equivalent_conv()
        return conv1d_receptive_field_center(frame, **eq)
