"""ToTaToNet: joint speech separation + diarization (flax).

Parity: /root/reference/src/pyannote/audio/models/separation/ToTaToNet.py
(PixIT, Kalda et al., Odyssey 2024): free conv encoder (64 filters, k=32,
s=16) -> DPRNN masker (6 repeats) -> masked representation -> transposed
conv decoder to 3 sources, plus a diarization branch (avg-pool of the
masked representation at 125 fps -> linear stack -> per-source activity).

The reference's optional WavLM-large branch requires downloading
microsoft/wavlm-large (no egress here) — ``use_wavlm=False`` is the
default; passing True raises until a local WavLM checkpoint is provided
via the ssl module.
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

    def setup(self):
        self.encoder = nn.Conv(self.n_filters, (self.kernel_size,),
                               strides=(self.stride,), padding="VALID",
                               use_bias=False)
        self.masker = DPRNN(in_chan=self.n_filters,
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
        masks = self.masker(rep)                  # (B, n_src, T', F)
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
                 use_wavlm: bool = False, wavlm_frozen: bool = False,
                 gradient_clip_val: float = 5.0, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        if use_wavlm:
            raise NotImplementedError(
                "the WavLM branch needs a local WavLM checkpoint "
                "(no model downloads in this environment); "
                "use use_wavlm=False")
        self.encoder_decoder = merge_dict(self.ENCODER_DECODER_DEFAULTS,
                                          encoder_decoder)
        self.linear = merge_dict(self.LINEAR_DEFAULTS, linear)
        self.dprnn = merge_dict(self.DPRNN_DEFAULTS, dprnn)
        self.diar = merge_dict(self.DIAR_DEFAULTS, diar)
        self.n_sources = n_sources
        self.hparams = {"encoder_decoder": self.encoder_decoder,
                        "linear": self.linear, "dprnn": self.dprnn,
                        "diar": self.diar, "n_sources": n_sources,
                        "use_wavlm": False}
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
        )

    @property
    def dimension(self) -> int:
        return 1

    def _equivalent_conv(self) -> Dict[str, int]:
        stride = self.diarization_scaling * self.encoder_decoder["stride"]
        kernel = self.diarization_scaling * \
            self.encoder_decoder["kernel_size"]
        return {"kernel_size": kernel, "stride": stride}

    def num_frames(self, num_samples: int) -> int:
        eq = self._equivalent_conv()
        return conv1d_num_frames(num_samples, **eq)

    def receptive_field_size(self, num_frames: int = 1) -> int:
        eq = self._equivalent_conv()
        return conv1d_receptive_field_size(num_frames, **eq)

    def receptive_field_center(self, frame: int = 0) -> int:
        eq = self._equivalent_conv()
        return conv1d_receptive_field_center(frame, **eq)
