"""Shared whole-file ResNet trunk: panel exactness + embedding fidelity.

The shared trunk (EmbeddingHotPathMixin._make_shared_trunk_fns) computes
the WeSpeaker trunk once per file in fixed-size halo'd panels instead of
once per overlapping chunk (~10x less compute at 1 s steps). Panels must
reproduce the whole-file trunk exactly; embeddings may differ from the
per-chunk path only through the documented approximations (file-level
CMN, real boundary context) and must stay close in cosine similarity.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.models.embedding.wespeaker import (
    BaseWeSpeakerResNet, WeSpeakerModule)
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.pipelines.speaker_diarization import \
    SpeakerDiarization


class TinyWeSpeaker(BaseWeSpeakerResNet):
    NUM_BLOCKS = (1, 1, 1, 1)
    BOTTLENECK = False


def _pipeline(emb, step=0.5):
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=1)
    seg.build()
    return SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_step=step,
        segmentation_batch_size=4, embedding_batch_size=4)


def test_panel_trunk_matches_whole_file_trunk():
    emb = TinyWeSpeaker()
    emb.build()
    pipeline = _pipeline(emb)
    # small panels so a short file spans several panel batches
    pipeline.TRUNK_PANEL_CORE = 16
    pipeline.TRUNK_PANEL_HALO = 16
    pipeline.TRUNK_PANEL_BATCH = 2

    window_samples = 2 * 16000
    compute_trunk, _, geometry = pipeline._make_shared_trunk_fns(
        window_samples, device_masks=True)

    rng = np.random.default_rng(0)
    num_samples = int(5.5 * 16000)
    wav = (0.1 * rng.standard_normal((1, num_samples))).astype(np.float32)

    from pyannote_audio_tpu.ops.fbank import fbank, fbank_num_frames
    num_real = fbank_num_frames(num_samples, 16000, 25.0, 10.0)
    trunk = np.asarray(compute_trunk(jnp.asarray(wav), num_real))

    # reference: the SAME halo-padded layout run through the trunk in one
    # unpanelized pass — panelization must be transparent (halo >= the
    # trunk's half receptive field). Note zero-halo context at the file
    # edges is a documented approximation vs per-chunk conv padding; it
    # is not what this test checks.
    feats = np.asarray(fbank(jnp.asarray(wav[0]) * 32768.0,
                             window_type="hamming"))
    # sliding-window CMN, replicated on host
    T = feats.shape[0]
    fpc = fbank_num_frames(2 * 16000, 16000, 25.0, 10.0)
    half = fpc // 2
    csum = np.vstack([np.zeros((1, feats.shape[1])),
                      np.cumsum(feats[:num_real], axis=0)])
    lo = np.clip(np.arange(T) - half, 0, None)
    hi = np.maximum(np.clip(np.arange(T) + half, None, num_real), lo + 1)
    mean = (csum[np.minimum(hi, num_real)] - csum[np.minimum(lo, num_real)]) \
        / np.maximum(hi - lo, 1)[:, None]
    centered = feats - mean
    centered[num_real:] = 0.0
    stride = geometry["stride"]
    core, halo, pbatch = (pipeline.TRUNK_PANEL_CORE,
                          pipeline.TRUNK_PANEL_HALO,
                          pipeline.TRUNK_PANEL_BATCH)
    t_total = -(-feats.shape[0] // stride)
    num_panels = -(-t_total // core)
    n_pb = -(-num_panels // pbatch)
    total = (n_pb * pbatch * core + 2 * halo) * stride
    padded = np.zeros((total, feats.shape[1]), np.float32)
    padded[halo * stride:halo * stride + feats.shape[0]] = centered
    module = emb.module
    whole = np.asarray(module.apply(
        emb.params, jnp.asarray(padded)[None], True,
        method=WeSpeakerModule.frames_from_fbank))[0]

    assert trunk.shape[0] >= t_total
    # bf16 trunk: different panel shapes round differently (~1%)
    np.testing.assert_allclose(trunk[:t_total],
                               whole[halo:halo + t_total],
                               rtol=5e-2, atol=6e-2)


@pytest.mark.slow
def test_shared_trunk_embeddings_close_to_per_chunk(tmp_path, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    emb = TinyWeSpeaker()
    emb.build()
    file = default_two_speaker_file(tmp_path / "x.wav")

    def embeddings(gate):
        monkeypatch.setenv("PYANNOTE_TPU_SHARED_TRUNK", gate)
        pipeline = _pipeline(emb)
        prep = pipeline.prepare_one(dict(file))
        segs = pipeline.get_segmentations(prep)
        return pipeline.get_embeddings(prep, segs), segs

    shared, segs = embeddings("1")
    per_chunk, _ = embeddings("0")
    assert shared.shape == per_chunk.shape

    # cosine similarity where the speaker is actually active
    active = np.nan_to_num(segs.data, nan=0.0).sum(axis=1) > 0  # (C, S)
    a = shared[active]
    b = per_chunk[active]
    cos = np.sum(a * b, axis=1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-9)
    # random untrained weights exaggerate the CMN approximation (trained
    # embedders are CMN-robust by construction); these bounds catch
    # gross regressions. With matched CMN the shared trunk agrees with
    # the per-chunk path at cos > 0.99 (see module docstring).
    assert cos.min() > 0.7, cos.min()
    assert cos.mean() > 0.85, cos.mean()


def test_pipeline_end_to_end_with_shared_trunk(tmp_path, monkeypatch):
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    monkeypatch.setenv("PYANNOTE_TPU_SHARED_TRUNK", "1")
    emb = TinyWeSpeaker()
    emb.build()
    pipeline = _pipeline(emb)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    file = default_two_speaker_file(tmp_path / "y.wav")
    out = pipeline(dict(file), max_speakers=3)
    assert out.speaker_diarization is not None
    assert len(out.speaker_diarization.labels()) <= 3


@pytest.mark.slow
def test_early_trunk_dispatch_is_used_and_equivalent(tmp_path,
                                                     monkeypatch):
    """apply() queues the shared trunk before the count host sync; the
    stashed result must be consumed by get_embeddings and must not change
    the output vs the late-dispatch path."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    monkeypatch.setenv("PYANNOTE_TPU_SHARED_TRUNK", "1")
    emb = TinyWeSpeaker()
    emb.build()
    pipeline = _pipeline(emb)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    file = default_two_speaker_file(tmp_path / "z.wav")

    stashed = []
    orig = type(pipeline)._start_shared_trunk

    def spy(self, f, device_masks):
        orig(self, f, device_masks=device_masks)
        stashed.append("_device_trunk" in f)
    monkeypatch.setattr(type(pipeline), "_start_shared_trunk", spy)
    f_early = pipeline.prepare_one(dict(file))
    out_early = pipeline.apply(f_early, max_speakers=3)
    assert stashed and stashed[0]             # trunk dispatched early
    assert "_device_trunk" not in f_early     # ...and consumed

    monkeypatch.setattr(type(pipeline), "_start_shared_trunk",
                        lambda self, f, device_masks: None)
    out_late = pipeline.apply(pipeline.prepare_one(dict(file)),
                              max_speakers=3)
    assert out_early.speaker_diarization.labels() == \
        out_late.speaker_diarization.labels()
    for (s1, _, l1), (s2, _, l2) in zip(
            out_early.speaker_diarization.itertracks(yield_label=True),
            out_late.speaker_diarization.itertracks(yield_label=True)):
        assert s1 == s2 and l1 == l2


@pytest.mark.slow
def test_shared_trunk_with_conv_fbank_matches_rfft(tmp_path, monkeypatch):
    """The composed-conv fbank (accelerator default) composes with the
    shared-trunk path: same chunk grid, same trunk geometry, and
    embeddings numerically close to the rfft-fbank run."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    from pyannote_audio_tpu.ops.fbank import fbank

    monkeypatch.setenv("PYANNOTE_TPU_SHARED_TRUNK", "1")
    file = default_two_speaker_file(tmp_path / "cf.wav")

    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("PYANNOTE_TPU_CONV_FBANK", flag)
        fbank.clear_cache()
        emb = TinyWeSpeaker()
        emb.build()
        pipeline = _pipeline(emb)
        pipeline.instantiate({
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1}})
        out = pipeline(dict(file), max_speakers=3)
        outs[flag] = out.speaker_diarization
    fbank.clear_cache()
    # identical final segmentation decisions on this corpus
    assert outs["0"].labels() == outs["1"].labels()
    t0 = [(seg.start, seg.end) for seg, _, _ in outs["0"].itertracks(
        yield_label=True)]
    t1 = [(seg.start, seg.end) for seg, _, _ in outs["1"].itertracks(
        yield_label=True)]
    assert len(t0) == len(t1)
    for (s0, e0), (s1, e1) in zip(t0, t1):
        assert abs(s0 - s1) < 0.05 and abs(e0 - e1) < 0.05


def test_shared_trunk_sharded_matches_single_device():
    """Under a mesh the panel trunk and gather-pool must shard over the
    'data' axis (they previously got a plain jit and ran replicated) and
    return exactly the single-device values."""
    from pyannote_audio_tpu.ops.fbank import fbank_num_frames
    from pyannote_audio_tpu.parallel import make_mesh

    emb = TinyWeSpeaker()
    emb.build()

    trunks = {}
    for mesh in (None, make_mesh()):
        pipeline = _pipeline(emb)
        pipeline.mesh = mesh
        pipeline.TRUNK_PANEL_CORE = 16
        pipeline.TRUNK_PANEL_HALO = 16
        pipeline.TRUNK_PANEL_BATCH = 8     # divisible by the 8-dev mesh
        compute_trunk, gather_pool_fn, geometry = \
            pipeline._make_shared_trunk_fns(2 * 16000, device_masks=True)
        rng = np.random.default_rng(1)
        num_samples = int(5.5 * 16000)
        wav = (0.1 * rng.standard_normal((1, num_samples))
               ).astype(np.float32)
        num_real = fbank_num_frames(num_samples, 16000, 25.0, 10.0)
        trunk = np.asarray(compute_trunk(jnp.asarray(wav), num_real))
        fpc = geometry["trunk_frames_per_chunk"]
        starts = jnp.asarray([0, 1, 2, 3, 4, 5, 6, 7], jnp.int32)
        masks = jnp.asarray(
            np.random.default_rng(2).uniform(
                size=(8, 2, fpc)).astype(np.float32))
        pooled = np.asarray(gather_pool_fn(
            emb.params, jnp.asarray(trunk), starts, masks, jnp.int32(0)))
        trunks[mesh is None] = (trunk, pooled)

    np.testing.assert_allclose(trunks[True][0], trunks[False][0],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(trunks[True][1], trunks[False][1],
                               rtol=1e-5, atol=1e-5)
