"""Fast debug embedding model for tests.

Parity role: SimpleEmbeddingModel (/root/reference/src/pyannote/audio/
models/embedding/debug.py) — conv front-end + LSTM + weighted stats pooling
-> fixed-dim embedding, exposing the same frames/embed split as the
WeSpeaker family so the diarization pipeline's fused hot path is exercised
cheaply.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.model import Model, Problem, Resolution, Specifications
from ...models.blocks.pooling import stats_pool
from ...utils.receptive_field import conv1d_num_frames

_KERNEL = 400
_STRIDE = 160


class _DebugEmbModule(nn.Module):
    hidden: int = 32
    embed_dim: int = 32

    def setup(self):
        self.frontend = nn.Conv(self.hidden, (_KERNEL,),
                                strides=(_STRIDE,), padding="VALID")
        self.proj = nn.Dense(self.embed_dim)

    def frames(self, waveforms: jnp.ndarray, train: bool = False
               ) -> jnp.ndarray:
        x = jnp.swapaxes(waveforms, 1, 2)
        return nn.tanh(self.frontend(x))            # (B, T', H)

    def embed(self, frames: jnp.ndarray, weights=None) -> jnp.ndarray:
        stats = stats_pool(jnp.swapaxes(frames, 1, 2), weights=weights)
        return self.proj(stats)

    def __call__(self, waveforms: jnp.ndarray, weights=None,
                 train: bool = False) -> jnp.ndarray:
        return self.embed(self.frames(waveforms), weights=weights)


class SimpleEmbeddingModel(Model):
    def __init__(self, sample_rate: int = 16000, num_channels: int = 1,
                 task=None, **kwargs):
        super().__init__(sample_rate=sample_rate, num_channels=num_channels,
                         task=task)
        self.embed_dim = 32
        if task is None:
            self._specifications = Specifications(
                problem=Problem.REPRESENTATION,
                resolution=Resolution.CHUNK,
                duration=2.0, min_duration=0.25)

    def build_module(self) -> nn.Module:
        return _DebugEmbModule(embed_dim=self.embed_dim)

    @property
    def dimension(self) -> int:
        return self.embed_dim

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
                                 method=_DebugEmbModule.frames)

    def forward_embedding(self, frames, weights=None):
        if self.module is None:
            self.build()
        return self.module.apply(self.params, jnp.asarray(frames), weights,
                                 method=_DebugEmbModule.embed)

    def num_frames(self, num_samples: int) -> int:
        return conv1d_num_frames(num_samples, kernel_size=_KERNEL,
                                 stride=_STRIDE)
