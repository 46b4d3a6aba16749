"""Parity tests: fused on-device diarization post-processing vs host path.

The device path (ops/diarize_fused.py + DeviceSlidingWindowFeature) must
produce bit-identical results to the host path: both share the overlap_add
kernel and static-shape bucketing, counts are rint-rounded the same way,
and rank binarization uses a stable sort on both sides.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyannote_audio_tpu.core.segment import (DeviceSlidingWindowFeature,
                                             SlidingWindow,
                                             SlidingWindowFeature)
from pyannote_audio_tpu.ops.aggregate import _bucket
from pyannote_audio_tpu.ops.diarize_fused import (fused_count_stats,
                                                  fused_reconstruct,
                                                  make_embedding_masks)
from pyannote_audio_tpu.pipelines.speaker_diarization import \
    SpeakerDiarization
from pyannote_audio_tpu.pipelines.utils.diarization import \
    SpeakerDiarizationMixin


def _random_binary_scores(rng, num_chunks=23, num_frames=40,
                          num_speakers=3):
    data = (rng.uniform(size=(num_chunks, num_frames, num_speakers))
            > 0.6).astype(np.float32)
    chunk_window = SlidingWindow(duration=2.0, step=0.4)
    frames = SlidingWindow(duration=0.05, step=0.05)
    return data, chunk_window, frames


def _padded(data, offsets):
    num_chunks = data.shape[0]
    C_pad = _bucket(num_chunks, 256)
    dev = jnp.pad(jnp.asarray(data),
                  ((0, C_pad - num_chunks), (0, 0), (0, 0)))
    mask = np.zeros(C_pad, np.float32)
    mask[:num_chunks] = 1.0
    off = np.pad(offsets, (0, C_pad - num_chunks))
    return dev, jnp.asarray(off), jnp.asarray(mask)


def test_fused_count_stats_matches_host(rng):
    data, chunk_window, frames = _random_binary_scores(rng)
    num_chunks = data.shape[0]
    swf = SlidingWindowFeature(data, chunk_window)

    host_count = SpeakerDiarizationMixin.speaker_count(
        swf, frames, warm_up=(0.0, 0.0))

    offsets, num_output_frames, window = \
        SpeakerDiarization._aggregation_grid(chunk_window, frames,
                                             num_chunks)
    dev, off, mask = _padded(data, offsets)
    F_bucket = _bucket(num_output_frames, 4096)
    count, speaker_frames, clean_frames = fused_count_stats(
        dev, off, mask, F_bucket)
    count = np.asarray(count)[:num_output_frames].astype(np.uint8)

    assert count.shape == host_count.data.shape
    assert np.array_equal(count, host_count.data)
    assert window.start == host_count.sliding_window.start
    assert window.step == host_count.sliding_window.step

    np.testing.assert_array_equal(
        np.asarray(speaker_frames)[:num_chunks], data.sum(axis=1))
    alone = data.sum(axis=2, keepdims=True) == 1
    np.testing.assert_array_equal(
        np.asarray(clean_frames)[:num_chunks],
        (data * alone).sum(axis=1))


def test_fused_reconstruct_matches_host(rng):
    data, chunk_window, frames = _random_binary_scores(rng)
    num_chunks, _, num_speakers = data.shape
    swf = SlidingWindowFeature(data, chunk_window)

    hard = rng.integers(0, 3, size=(num_chunks, num_speakers)).astype(
        np.int64)
    hard[0, 0] = -2  # inactive speaker

    count = SpeakerDiarizationMixin.speaker_count(swf, frames,
                                                  warm_up=(0.0, 0.0))
    count.data = np.minimum(count.data, 3).astype(np.int8)

    pipeline = SpeakerDiarization.__new__(SpeakerDiarization)
    host = pipeline.reconstruct(swf, hard, count)

    offsets, num_output_frames, _ = SpeakerDiarization._aggregation_grid(
        chunk_window, frames, num_chunks)
    dev_swf = DeviceSlidingWindowFeature(jnp.asarray(data), chunk_window)
    device, exclusive = pipeline._device_reconstruct(
        dev_swf, hard, count, offsets, num_output_frames)

    n = min(len(host.data), len(device.data))
    assert n > 0
    # pad host columns: fused output is always max(num_clusters, max count)
    h = host.data[:n]
    d = device.data[:n]
    if h.shape[1] < d.shape[1]:
        h = np.pad(h, ((0, 0), (0, d.shape[1] - h.shape[1])))
    np.testing.assert_array_equal(d, h)

    # exclusive variant == host reconstruct with count clipped to 1
    count.data = np.minimum(count.data, 1).astype(np.int8)
    host_excl = pipeline.reconstruct(swf, hard, count)
    he = host_excl.data[:n]
    de = exclusive.data[:n]
    if he.shape[1] < de.shape[1]:
        he = np.pad(he, ((0, 0), (0, de.shape[1] - he.shape[1])))
    np.testing.assert_array_equal(de, he)


@pytest.mark.parametrize("exclude_overlap", [False, True])
def test_make_embedding_masks_matches_host(rng, exclude_overlap):
    data, _, _ = _random_binary_scores(rng)
    min_num_frames = 3

    masks = np.nan_to_num(data, nan=0.0).astype(np.float32)
    if exclude_overlap:
        alone = masks.sum(axis=2, keepdims=True) < 2
        clean = masks * alone
        enough = clean.sum(axis=1, keepdims=True) > min_num_frames
        masks = np.where(enough, clean, masks)
    host = np.transpose(masks, (0, 2, 1))

    device = make_embedding_masks(jnp.asarray(data), exclude_overlap,
                                  min_num_frames)
    np.testing.assert_array_equal(np.asarray(device), host)


def test_device_swf_lazy_materialization(rng):
    data = rng.standard_normal((7, 5, 3)).astype(np.float32)
    window = SlidingWindow(duration=1.0, step=0.5)
    swf = DeviceSlidingWindowFeature(jnp.asarray(data), window)
    assert len(swf) == 7
    assert swf._host_data is None          # no sync yet
    np.testing.assert_array_equal(swf.data, data)
    assert swf._host_data is not None
    # setter overrides the device view
    swf.data = data[:3]
    assert len(swf) == 3


def test_pipeline_device_vs_host_identical(rng, tmp_path, monkeypatch):
    """Full diarization apply: device fast path == forced host path."""
    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    seg_model = SimpleSegmentationModel()
    seg_model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["spk0", "spk1", "spk2"], powerset_max_classes=2)
    seg_model.build()
    emb_model = SimpleEmbeddingModel()
    emb_model.build()

    sr = 16000
    wav = (0.05 * rng.standard_normal((1, sr * 21))).astype(np.float32)
    file = {"waveform": wav, "sample_rate": sr, "uri": "parity"}

    def build():
        p = SpeakerDiarization(
            segmentation=seg_model, embedding=emb_model,
            clustering="AgglomerativeClustering",
            embedding_batch_size=8, segmentation_batch_size=8)
        p.instantiate({
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1},
        })
        return p

    out_device = build()(dict(file), max_speakers=3)

    # force the host path: materialize segmentation scores after slide
    from pyannote_audio_tpu.core.inference import Inference
    orig_call = Inference.__call__

    def host_call(self, f, hook=None):
        out = orig_call(self, f, hook=hook)
        if isinstance(out, DeviceSlidingWindowFeature):
            out = SlidingWindowFeature(np.asarray(out.data),
                                       out.sliding_window,
                                       labels=out.labels)
        return out

    monkeypatch.setattr(Inference, "__call__", host_call)
    out_host = build()(dict(file), max_speakers=3)

    dev_turns = out_device.serialize()
    host_turns = out_host.serialize()
    assert dev_turns == host_turns


def test_nan_semantics_match_reference_order():
    """NaN frames (partial stitching) follow the reference's compute
    order: the overlap-free mask and the clean-frame statistics are
    taken on RAW scores (NaN propagates and disqualifies), NaN -> 0
    only afterwards (reference speaker_diarization.py:375-420,
    clustering.py:109-121)."""
    import jax.numpy as jnp

    from pyannote_audio_tpu.ops.diarize_fused import (fused_count_stats,
                                                      make_embedding_masks)

    C, F, S = 2, 8, 2
    scores = np.zeros((C, F, S), np.float32)
    # chunk 0: speaker 0 active alone on frames 0-3; frame 2 has a NaN
    # for speaker 1 -> that frame must NOT count as clean
    scores[0, 0:4, 0] = 1.0
    scores[0, 2, 1] = np.nan
    # chunk 1: speaker 0 clean on 2 frames only
    scores[1, 0:2, 0] = 1.0

    masks = np.asarray(make_embedding_masks(
        jnp.asarray(scores), True, 2))              # (C, S, F)
    # chunk 0 speaker 0: clean frames = {0,1,3} (frame 2 disqualified by
    # the NaN) -> 3 > min_num_frames=2 -> clean mask used, frame 2 zero
    assert masks[0, 0, 2] == 0.0
    assert masks[0, 0, 0] == 1.0 and masks[0, 0, 3] == 1.0
    # chunk 1 speaker 0: only 2 clean frames, NOT > 2 -> falls back to
    # the full (NaN->0) mask
    np.testing.assert_array_equal(masks[1, 0], np.nan_to_num(
        scores[1, :, 0]))

    # fused_count_stats: the NaN poisons speaker 1's stats in chunk 0
    # (reference filter_embeddings computes on raw data), and speaker 0's
    # clean count excludes the NaN frame
    offsets = jnp.zeros((C,), jnp.int32)
    mask = jnp.ones((C,), jnp.float32)
    _, speaker_frames, clean_frames = map(np.asarray, fused_count_stats(
        jnp.asarray(scores), offsets, mask, 16))
    assert np.isnan(speaker_frames[0, 1])
    assert np.isnan(clean_frames[0, 1])
    assert clean_frames[0, 0] == 3.0                # frame 2 not clean
    # NaN stats compare False everywhere, so the speaker is excluded by
    # any >= threshold gate exactly like host numpy
    assert not (clean_frames[0, 1] >= 0.0)
