"""Shared whole-file fbank fast path == per-chunk fbank (exactness)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.models.embedding.wespeaker import (
    BaseWeSpeakerResNet, WeSpeakerModule)


class TinyWeSpeaker(BaseWeSpeakerResNet):
    NUM_BLOCKS = (1, 1, 1, 1)
    BOTTLENECK = False


def test_frames_from_fbank_matches_frames():
    """Slicing a whole-signal fbank == per-chunk fbank, after centering."""
    from pyannote_audio_tpu.ops.fbank import fbank

    model = TinyWeSpeaker()
    model.build()
    module = model.module
    rng = np.random.default_rng(0)
    sr = 16000
    wav = (0.1 * rng.standard_normal(4 * sr)).astype(np.float32)

    # two chunks of 2s starting at frame-aligned offsets (1s = 100 frames)
    starts = [0, 16000]
    window = 2 * sr
    chunks = np.stack([wav[s:s + window] for s in starts])[:, None, :]

    per_chunk = np.asarray(model.module.apply(
        model.params, jnp.asarray(chunks),
        method=WeSpeakerModule.frames))

    whole = fbank(jnp.asarray(wav) * 32768.0, window_type="hamming")
    frames_per_chunk = 1 + (window - 400) // 160
    sliced = jnp.stack([
        whole[s // 160: s // 160 + frames_per_chunk] for s in starts])
    via_fbank = np.asarray(model.module.apply(
        model.params, sliced, False,
        method=WeSpeakerModule.frames_from_fbank))

    np.testing.assert_allclose(via_fbank, per_chunk, atol=0.05)


def test_pipeline_uses_shared_fbank(tmp_path):
    """End-to-end: embeddings identical between fast and fallback paths."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.core.segment import (SlidingWindow,
                                                 SlidingWindowFeature)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=1)
    seg.build()
    emb = TinyWeSpeaker()
    emb.build()
    file = default_two_speaker_file(tmp_path / "x.wav")

    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_step=0.5,  # 1s step on 2s chunks: frame-aligned
        segmentation_batch_size=4, embedding_batch_size=4)
    prep = pipeline.prepare_one(file)
    segs = pipeline.get_segmentations(prep)

    fast = pipeline.get_embeddings(prep, segs)
    # fast path taken (device-mask variant when scores stayed on device)
    assert (getattr(pipeline, "_jitted_fbank_embedding", None) is not None
            or getattr(pipeline, "_jitted_fbank_embedding_dev", None)
            is not None)

    emb_fallback = TinyWeSpeaker()
    emb_fallback.build()
    emb_fallback.params = emb.params
    pipeline2 = SpeakerDiarization(
        segmentation=seg, embedding=emb_fallback,
        clustering="AgglomerativeClustering",
        segmentation_step=0.501,  # 1.002 s: NOT frame-aligned -> fallback
        segmentation_batch_size=4, embedding_batch_size=4)
    prep2 = pipeline2.prepare_one(dict(file))
    segs2 = pipeline2.get_segmentations(prep2)
    slow = pipeline2.get_embeddings(prep2, segs2)
    assert getattr(pipeline2, "_jitted_fbank_embedding", None) is None
    assert getattr(pipeline2, "_jitted_fbank_embedding_dev", None) is None
    assert np.isfinite(fast).all() and np.isfinite(slow).all()
