"""Dual-path RNN masker for source separation, flax.

Re-implementation of the public DPRNN architecture (Luo, Chen, Yoshioka:
"Dual-path RNN: efficient long sequence modeling for time-domain
single-channel speech separation", ICASSP 2020) as used by the reference's
ToTaToNet via asteroid (SURVEY.md §2.2; defaults n_repeats=6, bn_chan=128,
hid_size=128, chunk_size=100, gLN, relu masks).

TPU-native design: the dual-path trick is already ideal for TPUs — the
time axis folds into (num_chunks, chunk_size), so the intra-chunk BiLSTM
runs with batch = B*num_chunks (large MXU-friendly batched matmuls) and
the inter-chunk BiLSTM with batch = B*chunk_size; both reuse the fused
scan LSTM (ops/lstm.py).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .rnn import LSTM


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over (time, channels) jointly, per sample."""

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (..., T, C) — normalize over all but the batch axis
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return (x - mean) / jnp.sqrt(var + self.eps) * scale + bias


class DPRNNBlock(nn.Module):
    """One dual-path block: intra-chunk BiLSTM + inter-chunk BiLSTM."""

    bn_chan: int = 128
    hid_size: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, S, K, C)  — S chunks of K frames, C channels
        B, S, K, C = x.shape
        # intra-chunk: sequence axis K, batch B*S
        h = x.reshape(B * S, K, C)
        h = LSTM(hidden_size=self.hid_size, num_layers=1,
                 bidirectional=True, name="intra_rnn")(h)
        h = nn.Dense(self.bn_chan, name="intra_proj")(h)
        h = h.reshape(B, S, K, C)
        x = x + GlobalLayerNorm(self.bn_chan, name="intra_norm")(h)
        # inter-chunk: sequence axis S, batch B*K
        h = jnp.swapaxes(x, 1, 2).reshape(B * K, S, C)
        h = LSTM(hidden_size=self.hid_size, num_layers=1,
                 bidirectional=True, name="inter_rnn")(h)
        h = nn.Dense(self.bn_chan, name="inter_proj")(h)
        h = jnp.swapaxes(h.reshape(B, K, S, C), 1, 2)
        return x + GlobalLayerNorm(self.bn_chan, name="inter_norm")(h)


class DPRNN(nn.Module):
    """Full masker: bottleneck -> chunk -> blocks -> overlap-add -> masks.

    Input (B, T, in_chan); output masks (B, n_src, T, out_chan).
    """

    in_chan: int = 64
    out_chan: int = 64
    n_src: int = 3
    bn_chan: int = 128
    hid_size: int = 128
    chunk_size: int = 100
    n_repeats: int = 6
    mask_act: str = "relu"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        h = GlobalLayerNorm(self.in_chan, name="in_norm")(x)
        h = nn.Dense(self.bn_chan, use_bias=False, name="bottleneck")(h)

        # fold time into 50%-overlapping chunks of chunk_size
        K = self.chunk_size
        hop = K // 2
        pad = (-(T - K) % hop) if T > K else K - T
        h = jnp.pad(h, ((0, 0), (hop, hop + pad), (0, 0)))
        Tp = h.shape[1]
        S = (Tp - K) // hop + 1
        idx = jnp.arange(S)[:, None] * hop + jnp.arange(K)[None, :]
        chunks = h[:, idx]                       # (B, S, K, C)

        for r in range(self.n_repeats):
            chunks = DPRNNBlock(self.bn_chan, self.hid_size,
                                name=f"block_{r}")(chunks)

        chunks = nn.PReLU(name="mask_prelu")(chunks)
        chunks = nn.Dense(self.n_src * self.out_chan,
                          name="mask_proj")(chunks)
        # overlap-add chunks back to the time axis
        C2 = self.n_src * self.out_chan
        flat_idx = idx.reshape(-1)
        out = jnp.zeros((B, Tp, C2), chunks.dtype)
        out = out.at[:, flat_idx].add(chunks.reshape(B, -1, C2))
        norm = jnp.zeros((Tp,), chunks.dtype).at[flat_idx].add(1.0)
        out = out / jnp.maximum(norm, 1.0)[None, :, None]
        out = out[:, hop:hop + T]
        masks = out.reshape(B, T, self.n_src, self.out_chan)
        masks = jnp.transpose(masks, (0, 2, 1, 3))  # (B, n_src, T, C)
        if self.mask_act == "relu":
            return nn.relu(masks)
        if self.mask_act == "sigmoid":
            return nn.sigmoid(masks)
        return masks
