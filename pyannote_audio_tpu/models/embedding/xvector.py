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
from ...utils.params import merge_dict
from ...utils.receptive_field import (multi_conv_num_frames,
                                      multi_conv_receptive_field_center,
                                      multi_conv_receptive_field_size)
from ..blocks.sincnet import SincNet

TDNN_CHANNELS = (512, 512, 512, 512, 1500)
TDNN_KERNELS = (5, 3, 3, 1, 1)
TDNN_DILATIONS = (1, 2, 3, 1, 1)


def _htk_mel_fbanks(n_freqs: int, n_mels: int, sample_rate: int,
                    f_min: float = 0.0,
                    f_max: Optional[float] = None) -> np.ndarray:
    """(n_freqs, n_mels) triangular filterbank, torchaudio
    ``melscale_fbanks`` semantics (mel_scale="htk", norm=None)."""
    f_max = f_max or sample_rate / 2.0

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)

    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]                       # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]          # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    return np.maximum(0.0, np.minimum(down, up)).astype(np.float32)


def mfcc_features(waveforms: jnp.ndarray, sample_rate: int = 16000,
                  n_mfcc: int = 40, n_mels: int = 128,
                  n_fft: int = 400, hop: int = 200,
                  top_db: float = 80.0) -> jnp.ndarray:
    """torchaudio ``transforms.MFCC`` defaults, exactly (the reference
    builds its front-end as ``MFCC(n_mfcc=40, dct_type=2, norm="ortho",
    log_mels=False)`` — reference xvector.py:43-60): centered reflect-pad
    STFT (hann periodic window, hop = n_fft // 2), power spectrum, HTK-mel
    128-bin filterbank (no slaney norm), ``amplitude_to_DB`` with
    top_db=80 clamped per item, then DCT-II (ortho).

    Returns (batch, frames, n_mfcc) with frames = 1 + samples // hop.
    """
    x = waveforms[..., 0, :] if waveforms.ndim == 3 else waveforms
    num_samples = x.shape[-1]
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + num_samples // hop
    idx = (jnp.arange(num_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    frames = xp[:, idx]                                  # (B, T, n_fft)
    n = jnp.arange(n_fft)
    window = 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * n / n_fft))  # periodic
    spec = jnp.abs(jnp.fft.rfft(frames * window, axis=-1)) ** 2
    fb = jnp.asarray(_htk_mel_fbanks(n_fft // 2 + 1, n_mels, sample_rate))
    mel = spec @ fb                                      # (B, T, n_mels)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    # top_db clamp relative to each item's max over (time, mel)
    db = jnp.maximum(db, jnp.max(db, axis=(-2, -1), keepdims=True)
                     - top_db)
    # DCT-II with ortho norm over the mel axis (torchaudio create_dct)
    k = jnp.arange(n_mfcc)[:, None]
    m = jnp.arange(n_mels)[None, :]
    basis = jnp.cos(jnp.pi / n_mels * (m + 0.5) * k) \
        * jnp.sqrt(2.0 / n_mels)
    basis = basis.at[0].multiply(1.0 / jnp.sqrt(2.0))
    return jnp.einsum("...tm,cm->...tc", db, basis)


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

    # -- torch conversion -------------------------------------------------

    def convert_torch_state_dict(self, state: Dict[str, np.ndarray]):
        """Map a reference XVector state_dict onto our param pytree.

        Reference layout (xvector.py:63-89): ``tdnns`` is a flat
        ModuleList [Conv1d, LeakyReLU, BatchNorm1d] x 5, so conv ``i``
        lives at ``tdnns.{3i}`` and its batch norm at ``tdnns.{3i+2}``;
        ``embedding`` is the final Linear. XVectorSincNet adds the same
        ``sincnet.*`` keys PyanNet checkpoints carry; XVectorMFCC's
        ``mfcc.*`` entries are parameter-free torchaudio buffers
        (window / mel fb / dct) and are ignored.
        """

        def get(name):
            return np.asarray(state[name], dtype=np.float32)

        tdnn_p: Dict = {}
        tdnn_s: Dict = {}
        for i in range(len(TDNN_CHANNELS)):
            t = 3 * i
            # torch conv weight (out, in, k) -> flax kernel (k, in, out)
            tdnn_p[f"tdnn_{i}"] = {
                "kernel": get(f"tdnns.{t}.weight").transpose(2, 1, 0),
                "bias": get(f"tdnns.{t}.bias")}
            tdnn_p[f"bn_{i}"] = {
                "scale": get(f"tdnns.{t + 2}.weight"),
                "bias": get(f"tdnns.{t + 2}.bias")}
            tdnn_s[f"bn_{i}"] = {
                "mean": get(f"tdnns.{t + 2}.running_mean"),
                "var": get(f"tdnns.{t + 2}.running_var")}
        params: Dict = {
            "tdnn": tdnn_p,
            "embedding": {"kernel": get("embedding.weight").T,
                          "bias": get("embedding.bias")},
        }
        if self.FRONTEND == "sincnet":
            from ..segmentation.pyannet import convert_sincnet_state_dict
            params["sincnet"] = convert_sincnet_state_dict(state)
        return {"params": params, "batch_stats": {"tdnn": tdnn_s}}

    def export_torch_state_dict(self) -> Dict[str, np.ndarray]:
        """Inverse of :meth:`convert_torch_state_dict`: reference-layout
        ``tdnns.*`` / ``embedding.*`` (+ ``sincnet.*`` for the sincnet
        front-end) state dict."""
        if self.params is None:
            raise ValueError("build or load the model before exporting")
        p, s = self.params["params"], self.params["batch_stats"]
        a = lambda x: np.asarray(x, dtype=np.float32)  # noqa: E731
        state: Dict[str, np.ndarray] = {}
        for i in range(len(TDNN_CHANNELS)):
            t = 3 * i
            state[f"tdnns.{t}.weight"] = a(
                p["tdnn"][f"tdnn_{i}"]["kernel"]).transpose(2, 1, 0)
            state[f"tdnns.{t}.bias"] = a(p["tdnn"][f"tdnn_{i}"]["bias"])
            state[f"tdnns.{t + 2}.weight"] = a(
                p["tdnn"][f"bn_{i}"]["scale"])
            state[f"tdnns.{t + 2}.bias"] = a(p["tdnn"][f"bn_{i}"]["bias"])
            state[f"tdnns.{t + 2}.running_mean"] = a(
                s["tdnn"][f"bn_{i}"]["mean"])
            state[f"tdnns.{t + 2}.running_var"] = a(
                s["tdnn"][f"bn_{i}"]["var"])
            state[f"tdnns.{t + 2}.num_batches_tracked"] = \
                np.asarray(0, dtype=np.int64)
        state["embedding.weight"] = a(p["embedding"]["kernel"]).T
        state["embedding.bias"] = a(p["embedding"]["bias"])
        if self.FRONTEND == "sincnet":
            from ..segmentation.pyannet import export_sincnet_state_dict
            state.update(export_sincnet_state_dict(p["sincnet"]))
        return state


class XVectorMFCC(_BaseXVector):
    FRONTEND = "mfcc"
    REFERENCE_ARCHITECTURE = ("pyannote.audio.models.embedding",
                              "XVectorMFCC")

    # torchaudio MelSpectrogram defaults the reference inherits
    # (center=True, n_fft=400, hop = n_fft // 2 — reference
    # xvector.py:97-127 frame math)
    _N_FFT = 400
    _HOP = 200

    def num_frames(self, num_samples: int) -> int:
        n = 1 + num_samples // self._HOP        # center=True framing
        return multi_conv_num_frames(
            n, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))

    def receptive_field_size(self, num_frames: int = 1) -> int:
        n = multi_conv_receptive_field_size(
            num_frames, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            dilation=list(TDNN_DILATIONS))
        return self._N_FFT + (n - 1) * self._HOP

    def receptive_field_center(self, frame: int = 0) -> int:
        c = multi_conv_receptive_field_center(
            frame, kernel_size=list(TDNN_KERNELS), stride=[1] * 5,
            padding=[0] * 5, dilation=list(TDNN_DILATIONS))
        return c * self._HOP                    # center=True


class XVectorSincNet(_BaseXVector):
    FRONTEND = "sincnet"
    REFERENCE_ARCHITECTURE = ("pyannote.audio.models.embedding",
                              "XVectorSincNet")

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
