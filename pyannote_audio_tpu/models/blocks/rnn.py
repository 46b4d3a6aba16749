"""Flax wrapper around the scan-based torch-compatible LSTM (ops/lstm.py)."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...ops.lstm import multilayer_lstm


def _uniform_init(scale: float):
    def init(key, shape):
        import jax
        return jax.random.uniform(key, shape, minval=-scale, maxval=scale)
    return init


class LSTM(nn.Module):
    """Multi-layer (bi)LSTM, params in torch layout for direct conversion.

    Input (B, T, D) -> (B, T, H * num_directions).
    """

    hidden_size: int = 128
    num_layers: int = 2
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        dirs = 2 if self.bidirectional else 1
        scale = 1.0 / (H ** 0.5)
        init = _uniform_init(scale)
        layers = []
        in_dim = x.shape[-1]
        for i in range(self.num_layers):
            layer = {
                "w_ih": self.param(f"w_ih_l{i}", init, (4 * H, in_dim)),
                "w_hh": self.param(f"w_hh_l{i}", init, (4 * H, H)),
                "b_ih": self.param(f"b_ih_l{i}", init, (4 * H,)),
                "b_hh": self.param(f"b_hh_l{i}", init, (4 * H,)),
            }
            if self.bidirectional:
                layer.update({
                    "w_ih_r": self.param(f"w_ih_l{i}_reverse", init,
                                         (4 * H, in_dim)),
                    "w_hh_r": self.param(f"w_hh_l{i}_reverse", init,
                                         (4 * H, H)),
                    "b_ih_r": self.param(f"b_ih_l{i}_reverse", init,
                                         (4 * H,)),
                    "b_hh_r": self.param(f"b_hh_l{i}_reverse", init,
                                         (4 * H,)),
                })
            layers.append(layer)
            in_dim = H * dirs
        from ...ops.pallas_lstm import (lstm_backend_is_pallas,
                                        pallas_multilayer_lstm)
        # Mosaic requires the gate slices (width H) to be lane-aligned
        if lstm_backend_is_pallas() and H % 128 == 0:
            return pallas_multilayer_lstm(
                x, layers, bidirectional=self.bidirectional)
        return multilayer_lstm(x, layers, bidirectional=self.bidirectional)
