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
    """One dual-path block: intra-chunk BiLSTM + inter-chunk BiLSTM.

    Residual/norm order follows asteroid's DPRNNBlock exactly
    (x + gLN(linear(rnn(x)))), so converted checkpoints reproduce."""

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
        h = nn.Dense(self.bn_chan, name="intra_linear")(h)
        h = h.reshape(B, S, K, C)
        x = x + GlobalLayerNorm(self.bn_chan, name="intra_norm")(h)
        # inter-chunk: sequence axis S, batch B*K
        h = jnp.swapaxes(x, 1, 2).reshape(B * K, S, C)
        h = LSTM(hidden_size=self.hid_size, num_layers=1,
                 bidirectional=True, name="inter_rnn")(h)
        h = nn.Dense(self.bn_chan, name="inter_linear")(h)
        h = jnp.swapaxes(h.reshape(B, K, S, C), 1, 2)
        return x + GlobalLayerNorm(self.bn_chan, name="inter_norm")(h)


class DPRNN(nn.Module):
    """Full masker: bottleneck -> chunk -> blocks -> overlap-add -> masks.

    Input (B, T, in_chan); output masks (B, n_src, T, out_chan).

    Numerics match asteroid's ``masknn.recurrent.DPRNN`` (the reference's
    masker, ToTaToNet.py:44,190-196) step for step so converted PixIT
    checkpoints reproduce: unfold pads ``chunk_size`` zeros on BOTH sides
    of the frame axis with hop = chunk_size // 2 (dropping an uncovered
    tail), the fold overlap-add does NOT average overlaps, and the folded
    representation passes through a tanh x sigmoid 1x1-conv gate
    (net_out / net_gate) before the mask activation.
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
        h = nn.Dense(self.bn_chan, name="bottleneck")(h)

        # asteroid framing: pad chunk_size both sides, hop = K // 2
        K = self.chunk_size
        hop = K // 2
        h = jnp.pad(h, ((0, 0), (K, K), (0, 0)))
        Tp = h.shape[1]                          # T + 2K
        S = (Tp - K) // hop + 1
        idx = jnp.arange(S)[:, None] * hop + jnp.arange(K)[None, :]
        chunks = h[:, idx]                       # (B, S, K, C)

        for r in range(self.n_repeats):
            chunks = DPRNNBlock(self.bn_chan, self.hid_size,
                                name=f"block_{r}")(chunks)

        # torch/asteroid nn.PReLU starts at 0.25 (flax defaults to 0.01)
        chunks = nn.PReLU(negative_slope_init=0.25,
                          name="mask_prelu")(chunks)
        chunks = nn.Dense(self.n_src * self.bn_chan,
                          name="first_out")(chunks)
        # fold (sum, NO overlap normalization — asteroid uses plain fold)
        chunks = chunks.reshape(B, S, K, self.n_src, self.bn_chan)
        out = jnp.zeros((B, Tp, self.n_src, self.bn_chan), chunks.dtype)
        out = out.at[:, idx].add(chunks)
        out = out[:, K:K + T]                    # (B, T, n_src, bn_chan)
        # gating in the folded space stays bn_chan-wide (asteroid's
        # net_out/net_gate are Conv1d(bn_chan, bn_chan, 1)); the final
        # bias-free mask_net projects to out_chan
        gated = jnp.tanh(nn.Dense(self.bn_chan, name="net_out")(out)) \
            * nn.sigmoid(nn.Dense(self.bn_chan, name="net_gate")(out))
        score = nn.Dense(self.out_chan, use_bias=False,
                         name="mask_net")(gated)
        masks = jnp.transpose(score, (0, 2, 1, 3))  # (B, n_src, T, C)
        if self.mask_act == "relu":
            return nn.relu(masks)
        if self.mask_act == "sigmoid":
            return nn.sigmoid(masks)
        return masks
