"""Fused on-device diarization post-processing.

The reference runs everything after the segmentation forward on host numpy
(speaker counting: pipelines/utils/diarization.py:149-185; reconstruction:
pipelines/speaker_diarization.py:480-528 + utils/diarization.py:220-268),
paying a device->host download of the full (chunks, frames, speakers)
score tensor plus two re-uploads for the overlap-add aggregations. Here
the scores never leave HBM: one dispatch yields the frame-level speaker
count together with the per-(chunk, speaker) activity statistics that
clustering needs, a second dispatch yields the count-constrained discrete
diarization (normal + exclusive variants fused), and only tiny arrays
cross the relay.

All functions take the chunk axis padded to a bucket (see
ops/aggregate._bucket) with an explicit ``chunk_mask`` so one executable
serves many file lengths.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .aggregate import overlap_add


@partial(jax.jit, static_argnames=("num_output_frames",))
def fused_count_stats(
    scores: jnp.ndarray,          # (C_pad, F, S) binarized scores
    frame_offsets: jnp.ndarray,   # (C_pad,) int32 output-frame offsets
    chunk_mask: jnp.ndarray,      # (C_pad,) 1.0 real / 0.0 pad
    num_output_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Speaker count + per-(chunk, speaker) activity stats, one dispatch.

    Returns:
      count:          (num_output_frames, 1) float32, rint-rounded
                      instantaneous speaker count (parity:
                      SpeakerDiarizationMixin.speaker_count with
                      warm_up=(0, 0), the product path).
      speaker_frames: (C_pad, S) number of active frames per local speaker
                      (drives ``inactive_speakers`` and VBx silent-speaker
                      masking, clustering.py:354).
      clean_frames:   (C_pad, S) frames where the speaker is active *alone*
                      (drives BaseClustering.filter_embeddings).

    Both statistics are NaN-PROPAGATING on purpose: the reference
    computes them on raw scores (filter_embeddings, reference
    clustering.py:109-121; inactive_speakers, speaker_diarization.py:
    681-685), so any NaN in a speaker's column makes its clean count
    NaN — every downstream ``>=``/``==`` comparison is then False and
    the speaker is excluded from clustering / not marked inactive,
    exactly like host numpy.
    """
    speaker_frames = jnp.sum(scores, axis=1)                    # (C, S)
    alone = jnp.sum(scores, axis=2, keepdims=True) == 1.0       # NaN->False
    clean_frames = jnp.sum(scores * alone, axis=1)              # (C, S)

    # NaN-propagating sum over speakers (np.sum semantics), then
    # hamming-free masked overlap-add average + rint
    summed = jnp.sum(scores, axis=-1, keepdims=True)            # (C, F, 1)
    ones = jnp.ones((scores.shape[1],), scores.dtype)
    out_sum, out_w = overlap_add(summed, frame_offsets, chunk_mask, ones,
                                 num_output_frames)
    average = out_sum / jnp.maximum(out_w, 1e-12)
    count = jnp.rint(jnp.where(out_w > 0, average, 0.0))
    # the host immediately casts the fetched count to uint8 (pipeline
    # _fetch_count_stats); casting ON DEVICE shrinks the fetch 4x. NaN
    # (possible only on NaN-stitched multilabel scores) maps to 0, the
    # value the x86 host cast produced anyway.
    count = jnp.nan_to_num(count).clip(0, 255).astype(jnp.uint8)
    return count, speaker_frames, clean_frames


@partial(jax.jit, static_argnames=("num_clusters", "num_output_frames"))
def fused_reconstruct(
    scores: jnp.ndarray,          # (C_pad, F, S) segmentation scores
    hard_clusters: jnp.ndarray,   # (C_pad, S) int32 cluster of each local
                                  # speaker (negative = discard)
    frame_offsets: jnp.ndarray,   # (C_pad,) int32
    chunk_mask: jnp.ndarray,      # (C_pad,)
    count: jnp.ndarray,           # (num_output_frames,) int32 speaker count
    num_clusters: int,
    num_output_frames: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster-max + overlap-add + count-constrained binarization.

    Parity: SpeakerDiarization.reconstruct (cluster-max over local
    speakers, speaker_diarization.py:480-528) followed by
    SpeakerDiarizationMixin.to_diarization (skip-average aggregation +
    keep-top-count binarization, utils/diarization.py:220-268). The
    exclusive variant (count clipped to 1, speaker_diarization.py:702-713)
    falls out of the same aggregation for free, so both are returned from
    one dispatch.

    Returns (binary, exclusive_binary) BIT-PACKED: each is the uint8
    ``packbits`` (big-endian, numpy default) of the flattened
    (num_output_frames, num_clusters) {0, 1} matrix — a 32x smaller
    fetch than float32. ``unpack_reconstruct`` restores the float32
    matrices exactly.
    """
    data = jnp.nan_to_num(scores, nan=-jnp.inf)
    member = hard_clusters[:, None, :, None] == \
        jnp.arange(num_clusters, dtype=hard_clusters.dtype)     # (C,1,S,K)
    masked = jnp.where(member, data[:, :, :, None], -jnp.inf)
    best = jnp.max(masked, axis=2)                              # (C, F, K)
    # NaN member scores poison the cluster max (reference np.max over
    # cluster members propagates NaN, speaker_diarization.py:519-521)
    any_nan = jnp.any(member & jnp.isnan(scores)[:, :, :, None], axis=2)
    # clusters with no member in a chunk contribute nothing (NaN ->
    # missing in the reference aggregate; weight 0 here)
    clustered = jnp.where(jnp.isfinite(best) & ~any_nan, best, jnp.nan)

    ones = jnp.ones((scores.shape[1],), scores.dtype)
    out_sum, out_w = overlap_add(clustered, frame_offsets, chunk_mask,
                                 ones, num_output_frames)
    # skip_average=True, missing=0.0 (to_diarization semantics)
    act = jnp.where(out_w > 0, out_sum, 0.0)                    # (F_out, K)

    # keep the count[t] highest-scoring clusters of each frame: a cluster
    # is active iff its rank (0 = loudest) < count
    order = jnp.argsort(-act, axis=-1)
    ranks = jnp.zeros_like(order).at[
        jnp.arange(act.shape[0])[:, None], order].set(
        jnp.broadcast_to(jnp.arange(num_clusters), act.shape))
    binary = ranks < count[:, None]
    exclusive = ranks < jnp.minimum(count, 1)[:, None]
    return (jnp.packbits(binary.reshape(-1)),
            jnp.packbits(exclusive.reshape(-1)))


def unpack_reconstruct(packed: np.ndarray, num_output_frames: int,
                       num_clusters: int) -> np.ndarray:
    """Host inverse of fused_reconstruct's bit-packing: exact float32
    (num_output_frames, num_clusters) {0, 1} matrix."""
    flat = np.unpackbits(np.asarray(packed),
                         count=num_output_frames * num_clusters)
    return flat.reshape(num_output_frames, num_clusters).astype(
        np.float32)


@partial(jax.jit, static_argnames=("exclude_overlap", "min_num_frames"))
def make_embedding_masks(
    scores: jnp.ndarray,          # (C_pad, F, S) binarized scores
    exclude_overlap: bool,
    min_num_frames: int,
) -> jnp.ndarray:
    """Per-(chunk, speaker) pooling masks, on device.

    Parity: the mask preparation in SpeakerDiarization.get_embeddings
    (reference speaker_diarization.py:375-420): the overlap-free mask is
    computed on the RAW scores first (a NaN frame sums to NaN, NaN < 2
    is False, so partially-stitched frames are never counted clean);
    NaN -> 0 happens afterwards, and the clean mask is used only when it
    keeps more than ``min_num_frames`` frames. Returns (C_pad, S, F).

    Module-level jit on the bucketed chunk axis: one executable per
    (bucket, F, S) signature instead of a fresh trace per call.
    """
    if exclude_overlap:
        alone = jnp.sum(scores, axis=2, keepdims=True) < 2      # NaN->False
        clean = jnp.nan_to_num(scores * alone, nan=0.0)
        enough = jnp.sum(clean, axis=1, keepdims=True) > min_num_frames
        masks = jnp.where(enough, clean, jnp.nan_to_num(scores, nan=0.0))
    else:
        masks = jnp.nan_to_num(scores, nan=0.0)
    return jnp.transpose(masks, (0, 2, 1))
