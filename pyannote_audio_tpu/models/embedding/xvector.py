"""x-vector TDNN speaker embedding models (flax).

Parity: /root/reference/src/pyannote/audio/models/embedding/xvector.py:
XVectorMFCC (:42 — MFCC front-end, 5 TDNN convs 512,512,512,512,1500 with
kernels [5,3,3,1,1] dilations [1,2,3,1,1], each LeakyReLU + BatchNorm1d,
StatsPool, Linear(3000 -> 512)) and XVectorSincNet (same TDNN over SincNet
features).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Resolution, Specifications
from ...models.blocks.pooling import stats_pool
from ...ops.fbank import fbank
from ...utils.params import merge_dict
from ...utils.receptive_field import (multi_conv_num_frames,
                                      multi_conv_receptive_field_center,
                                      multi_conv_receptive_field_size)
from ..blocks.sincnet import SincNet

TDNN_CHANNELS = (512, 512, 512, 512, 1500)
TDNN_KERNELS = (5, 3, 3, 1, 1)
TDNN_DILATIONS = (1, 2, 3, 1, 1)


def mfcc_features(waveforms: jnp.ndarray, sample_rate: int = 16000,
                  n_mfcc: int = 40, n_mels: int = 128) -> jnp.ndarray:
    """MFCC: log-mel fbank -> DCT-II (ortho), torchaudio-like defaults.

    Frame math follows snip_edges framing (400/160 at 16 kHz).
    """
    x = waveforms[..., 0, :] if waveforms.ndim == 3 else waveforms
    mel = fbank(x, sample_rate=sample_rate, num_mel_bins=n_mels,
                window_type="hanning", remove_dc_offset=False,
                preemphasis_coefficient=0.0, low_freq=0.0)
    # DCT-II with ortho norm over the mel axis
    n = mel.shape[-1]
    k = jnp.arange(n_mfcc)[:, None]
    m = jnp.arange(n)[None, :]
    basis = jnp.cos(jnp.pi / n * (m + 0.5) * k) * jnp.sqrt(2.0 / n)
    basis = basis.at[0].multiply(1.0 / jnp.sqrt(2.0))
    return jnp.einsum("...tm,cm->...tc", mel, basis)


class TDNNStack(nn.Module):
    """5 dilated 1-d convs with LeakyReLU + BatchNorm."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c, k, d) in enumerate(zip(TDNN_CHANNELS, TDNN_KERNELS,
                                          TDNN_DILATIONS)):
            x = nn.Conv(c, (k,), kernel_dilation=(d,), padding="VALID",
                        name=f"tdnn_{i}")(x)
            x = nn.leaky_relu(x, 0.01)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name=f"bn_{i}")(x)
        return x


class XVectorModule(nn.Module):
    frontend: str = "mfcc"        # "mfcc" | "sincnet"
    n_mfcc: int = 40
    sincnet_stride: int = 10
    sample_rate: int = 16000
    dimension: int = 512

    def setup(self):
        self.tdnn = TDNNStack()
        self.embedding = nn.Dense(self.dimension)
        if self.frontend == "sincnet":
            self.sincnet = SincNet(stride=self.sincnet_stride,
                                   sample_rate=self.sample_rate)

    def features(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        if self.frontend == "mfcc":
            return mfcc_features(waveforms, self.sample_rate, self.n_mfcc)
        return self.sincnet(waveforms)

    def frames(self, waveforms: jnp.ndarray, train: bool = False
               ) -> jnp.ndarray:
        return self.tdnn(self.features(waveforms), train=train)

    def embed(self, frames: jnp.ndarray,
              weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        stats = stats_pool(jnp.swapaxes(frames, 1, 2), weights=weights)
        return self.embedding(stats)

    def __call__(self, waveforms: jnp.ndarray,
                 weights: Optional[jnp.ndarray] = None,
                 train: bool = False) -> jnp.ndarray:
        return self.embed(self.frames(waveforms, train=train),
                          weights=weights)


class _BaseXVector(Model):
    FRONTEND = "mfcc"

    def __init__(self, sample_rate: int = 16000, num_channels: int = 1,
                 mfcc: Optional[dict] = None, sincnet: Optional[dict] = None,
                 dimension: int = 512, task=None, **kwargs):
        super().__init__(sample_rate=sample_rate,
                         num_channels=num_channels, task=task)
        self.mfcc = merge_dict({"n_mfcc": 40}, mfcc)
        self.sincnet = merge_dict({"stride": 10}, sincnet)
        self._dimension = dimension
        self.hparams = {"mfcc": self.mfcc, "sincnet": self.sincnet,
                        "dimension": dimension}
        if self._specifications is None and task is None:
            self._specifications = Specifications(
                problem=Problem.REPRESENTATION,
                resolution=Resolution.CHUNK, duration=5.0,
                min_duration=0.5)

    @property
    def dimension(self) -> int:
        return self._dimension

    def build_module(self) -> nn.Module:
        return XVectorModule(frontend=self.FRONTEND,
                             n_mfcc=self.mfcc["n_mfcc"],
                             sincnet_stride=self.sincnet["stride"],
                             sample_rate=self.sample_rate,
                             dimension=self._dimension)

    def __call__(self, waveforms, weights=None):
        if self.module is None:
            self.build()
        if self._jitted_apply is None:
            self._jitted_apply = jax.jit(self.module.apply)
        return self._jitted_apply(self.params, jnp.asarray(waveforms),
                                  None if weights is None
                                  else jnp.asarray(weights))

    def forward_frames(self, waveforms):
        if self.module is None:
            self.build()
        return self.module.apply(self.params, jnp.asarray(waveforms),
                                 method=XVectorModule.frames)

    def forward_embedding(self, frames, weights=None):
        if self.module is None:
            self.build()
        return self.module.apply(self.params, jnp.asarray(frames), weights,
                                 method=XVectorModule.embed)


class XVectorMFCC(_BaseXVector):
    FRONTEND = "mfcc"

    def num_frames(self, num_samples: int) -> int:
        n = 1 + (num_samples - 400) // 160 if num_samples >= 400 else 0
        return multi_conv_num_frames(
            n, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))

    def receptive_field_size(self, num_frames: int = 1) -> int:
        n = multi_conv_receptive_field_size(
            num_frames, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            dilation=list(TDNN_DILATIONS))
        return 400 + (n - 1) * 160

    def receptive_field_center(self, frame: int = 0) -> int:
        c = multi_conv_receptive_field_center(
            frame, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))
        return c * 160 + 200


class XVectorSincNet(_BaseXVector):
    FRONTEND = "sincnet"

    def num_frames(self, num_samples: int) -> int:
        n = SincNet.num_frames(num_samples, stride=self.sincnet["stride"])
        return multi_conv_num_frames(
            n, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))

    def receptive_field_size(self, num_frames: int = 1) -> int:
        n = multi_conv_receptive_field_size(
            num_frames, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            dilation=list(TDNN_DILATIONS))
        return SincNet.receptive_field_size(n,
                                            stride=self.sincnet["stride"])

    def receptive_field_center(self, frame: int = 0) -> int:
        c = multi_conv_receptive_field_center(
            frame, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))
        return SincNet.receptive_field_center(
            c, stride=self.sincnet["stride"])
