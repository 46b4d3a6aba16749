"""Fast debug segmentation model for tests.

Parity role: SimpleSegmentationModel (/root/reference/src/pyannote/audio/
models/segmentation/debug.py) — a CPU-fast stand-in exercising the same
Model contract (frame math, task head, checkpointing). Architecture here is
a strided conv front-end (frame rate 100 Hz) + tiny BiLSTM + classifier
(the reference uses MFCC + BiLSTM; an MFCC front-end needs no testing
beyond ops/fbank, so a conv keeps compile times low).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ...core.model import Model, Problem, Specifications
from ...utils.receptive_field import (conv1d_num_frames,
                                      conv1d_receptive_field_center,
                                      conv1d_receptive_field_size)
from ..blocks.rnn import LSTM

_KERNEL = 400
_STRIDE = 160


class _DebugSegModule(nn.Module):
    hidden: int = 32
    dimension: int = 2
    activation: str = "log_softmax"

    @nn.compact
    def __call__(self, waveforms: jnp.ndarray) -> jnp.ndarray:
        x = jnp.swapaxes(waveforms, 1, 2)           # (B, T, C)
        x = nn.Conv(self.hidden, (_KERNEL,), strides=(_STRIDE,),
                    padding="VALID", name="frontend")(x)
        x = nn.tanh(x)
        x = LSTM(hidden_size=self.hidden, num_layers=1,
                 bidirectional=True, name="lstm")(x)
        x = nn.Dense(self.dimension, name="classifier")(x)
        if self.activation == "log_softmax":
            return nn.log_softmax(x, axis=-1)
        return nn.sigmoid(x)


class SimpleSegmentationModel(Model):
    def __init__(self, sample_rate: int = 16000, num_channels: int = 1,
                 task=None, **kwargs):
        super().__init__(sample_rate=sample_rate, num_channels=num_channels,
                         task=task)

    def _activation_name(self) -> str:
        specs = self.specifications
        spec = specs if isinstance(specs, Specifications) else specs[0]
        if spec.problem == Problem.MONO_LABEL_CLASSIFICATION:
            return "log_softmax"
        return "sigmoid"

    def build_module(self) -> nn.Module:
        return _DebugSegModule(dimension=self.dimension,
                               activation=self._activation_name())

    def num_frames(self, num_samples: int) -> int:
        return conv1d_num_frames(num_samples, kernel_size=_KERNEL,
                                 stride=_STRIDE)

    def receptive_field_size(self, num_frames: int = 1) -> int:
        return conv1d_receptive_field_size(num_frames, kernel_size=_KERNEL,
                                           stride=_STRIDE)

    def receptive_field_center(self, frame: int = 0) -> int:
        return conv1d_receptive_field_center(frame, kernel_size=_KERNEL,
                                             stride=_STRIDE)
