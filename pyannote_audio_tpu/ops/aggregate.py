"""Sliding-window overlap-add aggregation, fully on-device.

Parity: Inference.aggregate (/root/reference/src/pyannote/audio/core/
inference.py:498-620): hamming-window weighting, warm-up down-weighting,
NaN-masked overlap-add, average + missing-frame mask.

TPU-native design: the reference loops over chunks in numpy on host; here the
whole overlap-add is one jitted scatter-add over a precomputed per-chunk
frame-offset vector (offsets vary by +-1 frame due to closest_frame rounding,
so they are data, not structure). O(num_chunks * frames_per_chunk) with no
host sync; the chunk axis shards trivially under pjit (scatter-add commutes
with psum).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def hamming_weights(num_frames: int, dtype=jnp.float32) -> jnp.ndarray:
    """Symmetric hamming window (matches torch.hamming_window periodic=False)."""
    if num_frames == 1:
        return jnp.ones((1,), dtype)
    n = jnp.arange(num_frames, dtype=dtype)
    return 0.54 - 0.46 * jnp.cos(2.0 * jnp.pi * n / (num_frames - 1))


def warmup_weights(num_frames: int, warm_up: Tuple[float, float],
                   dtype=jnp.float32) -> jnp.ndarray:
    """Down-weight warm-up regions by 1e-12 (reference inference.py:548-559)."""
    w = np.ones(num_frames, dtype=np.float32)
    left = round(warm_up[0] * num_frames)
    right = round(warm_up[1] * num_frames)
    if left > 0:
        w[:left] = 1e-12
    if right > 0:
        w[-right:] = 1e-12
    return jnp.asarray(w, dtype=dtype)


@partial(jax.jit, static_argnames=("num_output_frames",))
def overlap_add(
    scores: jnp.ndarray,          # (num_chunks, frames_per_chunk, C)
    frame_offsets: jnp.ndarray,   # (num_chunks,) int32 output-frame offsets
    chunk_mask: jnp.ndarray,      # (num_chunks,) 1.0 = real chunk, 0.0 = pad
    window_weights: jnp.ndarray,  # (frames_per_chunk,) hamming*warmup weights
    num_output_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked weighted overlap-add.

    Returns (weighted_sum (F_out, C), weight_sum (F_out, C)).
    NaN scores are treated as missing (weight zero), matching the
    reference's mask = 1 - np.isnan(score) (inference.py:592) exactly:
    +/-inf scores keep full weight and propagate into the average, as
    they do through the reference's numpy sums.
    """
    num_chunks, frames, C = scores.shape
    valid = ~jnp.isnan(scores)
    w = window_weights[None, :, None] * chunk_mask[:, None, None]
    w = jnp.where(valid, w, 0.0)
    x = jnp.where(valid, scores, 0.0) * w
    # flat scatter-add over output frames
    idx = frame_offsets[:, None] + jnp.arange(frames, dtype=jnp.int32)[None]
    idx = idx.reshape(-1)
    # frames scattered out of range are dropped via clamp+zero-weight
    in_range = (idx >= 0) & (idx < num_output_frames)
    idx = jnp.clip(idx, 0, num_output_frames - 1)
    x = jnp.where(in_range[:, None], x.reshape(-1, C), 0.0)
    wf = jnp.where(in_range[:, None], w.reshape(-1, C), 0.0)
    out_sum = jnp.zeros((num_output_frames, C), scores.dtype).at[idx].add(x)
    out_w = jnp.zeros((num_output_frames, C), scores.dtype).at[idx].add(wf)
    return out_sum, out_w


def _bucket(n: int, quantum: int = 512) -> int:
    """Round up so few distinct static shapes serve all file lengths."""
    return max(quantum, -(-n // quantum) * quantum)


def pad_chunk_bucket(scores: jnp.ndarray, frame_offsets: "np.ndarray",
                     num_chunks: int, quantum: int = 256):
    """Pad the chunk axis to its bucket for a fused dispatch.

    Returns (scores (C_pad, ...) zero-padded, offsets (C_pad,) host,
    chunk_mask (C_pad,) host f32 with ones for real chunks) — the
    argument triple every fused dispatch takes (fused_count_stats,
    fused_reconstruct, aggregate_scores)."""
    C_pad = _bucket(num_chunks, quantum)
    if C_pad > scores.shape[0]:
        scores = jnp.pad(scores, ((0, C_pad - scores.shape[0]),)
                         + ((0, 0),) * (scores.ndim - 1))
    chunk_mask = np.zeros(C_pad, np.float32)
    chunk_mask[:num_chunks] = 1.0
    offsets = np.pad(np.asarray(frame_offsets),
                     (0, C_pad - len(frame_offsets)))
    return scores, offsets, chunk_mask


def aggregate_scores(
    scores: jnp.ndarray,
    frame_offsets: jnp.ndarray,
    num_output_frames: int,
    chunk_mask: Optional[jnp.ndarray] = None,
    hamming: bool = False,
    warm_up: Tuple[float, float] = (0.0, 0.0),
    missing: float = jnp.nan,
    skip_average: bool = False,
) -> jnp.ndarray:
    """Full aggregation: weights -> overlap_add -> (optional) average.

    Frames covered by no chunk get ``missing`` (reference inference.py:618).
    Inputs are padded to bucketed shapes so one compiled executable serves
    many file lengths (SURVEY.md §7.0 static-shape bucketing); padded
    chunks are masked out and padded output frames sliced away.
    """
    num_chunks, frames, C = scores.shape
    if chunk_mask is None:
        chunk_mask = jnp.ones((num_chunks,), scores.dtype)

    chunk_bucket = _bucket(num_chunks, 256)
    frame_bucket = _bucket(num_output_frames, 4096)
    if chunk_bucket > num_chunks:
        pad = chunk_bucket - num_chunks
        scores = jnp.pad(scores, ((0, pad), (0, 0), (0, 0)))
        frame_offsets = jnp.pad(frame_offsets, (0, pad))
        chunk_mask = jnp.pad(chunk_mask, (0, pad))

    w = hamming_weights(frames) if hamming else jnp.ones((frames,),
                                                         scores.dtype)
    w = w * warmup_weights(frames, warm_up)
    out_sum, out_w = overlap_add(scores, frame_offsets, chunk_mask, w,
                                 frame_bucket)
    if skip_average:
        average = out_sum
    else:
        # epsilon-floored divisor (reference inference.py:615): frames
        # covered only by warm-up regions are attenuated toward 0 rather
        # than properly averaged — intentional reference semantics
        average = out_sum / jnp.maximum(out_w, 1e-12)
    return jnp.where(out_w > 0, average, missing)[:num_output_frames]
