"""Normalization blocks with torch-compatible semantics."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class InstanceNorm1d(nn.Module):
    """Per-(batch, channel) normalization over time, channel-last layout.

    Matches torch.nn.InstanceNorm1d(C, affine=True): biased variance,
    eps=1e-5, per-channel scale/shift. Input/output: (batch, time, channels).
    """

    features: int
    affine: bool = True
    eps: float = 1e-5

    def setup(self):
        # setup-style (not compact) so siblings can read the affine
        # parameters — SincNet.from_conv folds them into the shared
        # whole-file sinc convolution.
        if self.affine:
            self.scale = self.param("scale", nn.initializers.ones,
                                    (self.features,))
            self.bias = self.param("bias", nn.initializers.zeros,
                                   (self.features,))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        y = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            y = y * self.scale + self.bias
        return y


class BatchNorm1d(nn.Module):
    """Inference-mode batch norm using stored running statistics.

    Torch BatchNorm1d parity for converted checkpoints: uses running_mean /
    running_var (stored as params since they are fixed at inference);
    training-mode statistics are handled by the training stack via
    flax mutable batch_stats when needed. Channel-last (B, T, C) layout.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        if train:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias
