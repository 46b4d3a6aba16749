"""Weighted temporal statistics pooling.

Parity: StatsPool (/root/reference/src/pyannote/audio/models/blocks/
pooling.py): weighted mean + *unbiased* weighted standard deviation
(reliability-weights correction v1 - v2/v1), with nearest-interpolation of
weights to the frame axis and optional per-speaker weight stacks.

TPU-native design: one fused pass — the mean/var reductions are two
weighted matvecs over the frame axis; the speaker axis (for the diarization
hot path) is just an extra batch dimension, so a (batch, speakers, frames)
weight tensor pools every speaker of every chunk in a single kernel instead
of the reference's per-speaker python loop (pooling.py:119-125).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def interpolate_weights(weights: jnp.ndarray, num_frames: int) -> jnp.ndarray:
    """Nearest-neighbor interpolation of (..., w_frames) to (..., num_frames).

    Matches torch F.interpolate(mode="nearest") as used by the reference
    (pooling.py:114-117).
    """
    w_frames = weights.shape[-1]
    if w_frames == num_frames:
        return weights
    idx = (jnp.arange(num_frames) * w_frames) // num_frames
    return weights[..., idx]


def stats_pool(
    sequences: jnp.ndarray,                 # (batch, features, frames)
    weights: Optional[jnp.ndarray] = None,  # (batch, [speakers,] w_frames)
) -> jnp.ndarray:
    """Weighted mean+std pooling.

    Returns (batch, 2*features) or (batch, speakers, 2*features).
    """
    b, f, t = sequences.shape
    if weights is None:
        mean = jnp.mean(sequences, axis=-1)
        # torch.std default: unbiased (N-1)
        var = jnp.sum(
            jnp.square(sequences - mean[..., None]), axis=-1) / max(t - 1, 1)
        std = jnp.sqrt(var)
        return jnp.concatenate([mean, std], axis=-1)

    has_speakers = weights.ndim == 3
    if not has_speakers:
        weights = weights[:, None, :]       # (b, 1, wf)
    weights = interpolate_weights(weights, t)  # (b, s, t)

    v1 = jnp.sum(weights, axis=-1) + 1e-8               # (b, s)
    v2 = jnp.sum(jnp.square(weights), axis=-1)          # (b, s)
    # weighted sums as one MXU contraction: (b,s,t)x(b,f,t) -> (b,s,f)
    # f32 precision: the x^2 trick below cancels significant digits, and
    # these contractions are tiny next to the conv trunk
    hi = jax.lax.Precision.HIGHEST
    wsum = jnp.einsum("bst,bft->bsf", weights, sequences, precision=hi)
    mean = wsum / v1[..., None]
    # sum_w (x-m)^2 == sum_w x^2 - v1*m^2: avoids the (b,s,f,t) intermediate
    wsq = jnp.einsum("bst,bft->bsf", weights, jnp.square(sequences),
                     precision=hi)
    var = (wsq - v1[..., None] * jnp.square(mean)) / \
        (v1 - v2 / v1 + 1e-8)[..., None]
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    out = jnp.concatenate([mean, std], axis=-1)         # (b, s, 2f)
    if not has_speakers:
        out = out[:, 0]
    return out


class StatsPool:
    """Callable wrapper for API parity with the reference module."""

    def __call__(self, sequences, weights=None):
        return stats_pool(sequences, weights=weights)
