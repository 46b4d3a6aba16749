"""Bounded-HBM long-file slicing == whole-file outputs.

core/longfile.py processes files whose whole-file device buffers would
exceed the HBM budget in fixed halo'd slices (parity capability:
reference core/inference.py:261-305 keeps activation memory O(chunk) for
any duration). Because every front-end involved is a convolution plus a
sliding CMN, a slice carrying enough real-audio halo produces the same
frames for every chunk it owns — these tests force tiny slices on short
files and pin slice outputs to the whole-file path, for Inference.slide
(shared + per-chunk front-ends) and the diarization embedding stage
(shared trunk, shared fbank, and raw-waveform modes).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyannote_audio_tpu.core.inference import Inference, _chunk_grid
from pyannote_audio_tpu.core.longfile import (ALIGN, halo_samples,
                                              plan_slices,
                                              segment_minutes,
                                              slice_uploads)
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)


# ------------------------------------------------------------ planning

def test_plan_slices_partition_and_alignment(monkeypatch):
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.2")   # 12 s
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    sr = 16000
    window, step = 2 * sr, sr // 2
    num_samples = 41 * sr + 123
    starts, _ = _chunk_grid(num_samples, window, step, sr)
    plan = plan_slices(num_samples, window, step, sr, starts)
    assert plan is not None and len(plan) > 1
    # every chunk owned by exactly one slice, in order
    assert plan[0].i0 == 0 and plan[-1].i1 == len(starts)
    for prev, cur in zip(plan, plan[1:]):
        assert prev.i1 == cur.i0
    halo = halo_samples(sr)
    for sl in plan:
        assert sl.a % ALIGN == 0
        assert 0 <= sl.a <= int(starts[sl.i0])
        # halo'd bounds contain every owned chunk's samples (clipped at
        # the true file edges, where the whole-file path clips too)
        assert sl.a <= max(0, int(starts[sl.i0]) - halo)
        assert sl.b >= min(num_samples, int(starts[sl.i1 - 1]) + window)
        assert sl.b <= num_samples


def test_segment_minutes_auto_and_forced(monkeypatch):
    monkeypatch.delenv("PYANNOTE_TPU_SEGMENT_MINUTES", raising=False)
    monkeypatch.delenv("PYANNOTE_TPU_HBM_BUDGET_GB", raising=False)
    # default 6 GB budget: whole-file for 1 h, slices for 6 h
    assert segment_minutes(3600.0) is None
    assert segment_minutes(6 * 3600.0) is not None
    # a tight budget forces slicing earlier...
    monkeypatch.setenv("PYANNOTE_TPU_HBM_BUDGET_GB", "1.0")
    assert segment_minutes(3600.0) is not None
    # ...and "0" disables slicing for any duration (round-4 behavior)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0")
    assert segment_minutes(24 * 3600.0) is None


def test_slice_uploads_shared_and_released(monkeypatch, rng):
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.1")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    sr = 16000
    window, step = 2 * sr, sr // 2
    wav = (0.05 * rng.standard_normal((1, 20 * sr))).astype(np.float32)
    starts, _ = _chunk_grid(wav.shape[1], window, step, sr)
    plan = plan_slices(wav.shape[1], window, step, sr, starts)
    assert plan is not None and len(plan) > 1
    file = {}
    get_upload, release = slice_uploads(file, wav, plan, sr,
                                        starts, window)
    buf0, _ = get_upload(0)
    # second caller (other pipeline stage) reuses the cached device buffer
    get2, _ = slice_uploads(file, wav, plan, sr, starts, window)
    buf0_again, _ = get2(0)
    assert buf0 is buf0_again
    release(0)
    assert not _buffer_keys(file["_longfile_uploads"])
    # mutated waveform in a reused file dict must NOT serve stale buffers
    buf0, _ = get_upload(0)
    wav2 = wav.copy()
    wav2[0, 1000] += 0.5
    get3, _ = slice_uploads(file, wav2, plan, sr, starts, window)
    buf0_new, _ = get3(0)
    assert buf0_new is not buf0


def _buffer_keys(cache):
    return [k for k in cache if isinstance(k, tuple)]


def test_slice_padding_covers_zero_padded_tail(monkeypatch):
    """The final slice's last chunk can extend past the true file end;
    padded_len must cover starts[i1-1] - a + window or the in-jit gather
    clamps (wrong data) instead of reading zeros. Repro geometry: last
    slice's length lands within one tail-shortfall of a 30 s bucket
    multiple."""
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "1.0")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    sr = 16000
    window, step = 2 * sr, sr // 2
    num_samples = 2384160
    starts, _ = _chunk_grid(num_samples, window, step, sr)
    plan = plan_slices(num_samples, window, step, sr, starts)
    assert plan is not None and len(plan) > 1
    rng = np.random.default_rng(0)
    wav = (0.05 * rng.standard_normal((1, num_samples))
           ).astype(np.float32)
    get_upload, _ = slice_uploads({}, wav, plan, sr, starts, window)
    sl = plan[-1]
    _, padded_len = get_upload(len(plan) - 1)
    assert padded_len >= int(starts[sl.i1 - 1]) - sl.a + window


def test_chunk_grid_int64_and_whole_file_guard(monkeypatch):
    """Sample starts exceed int32 beyond ~37 h at 16 kHz: the grid is
    int64, the whole-file device cast refuses overflow loudly, and every
    planned slice's TRANSLATED starts fit int32."""
    from pyannote_audio_tpu.core.inference import _starts_i32

    monkeypatch.delenv("PYANNOTE_TPU_SEGMENT_MINUTES", raising=False)
    sr, window, step = 16000, 10 * 16000, 16000
    n40h = 40 * 3600 * sr
    starts, _ = _chunk_grid(n40h, window, step, sr)
    assert starts.dtype == np.int64
    assert int(starts[-1]) + window > np.iinfo(np.int32).max
    with pytest.raises(ValueError, match="slice"):
        _starts_i32(starts, window)
    plan = plan_slices(n40h, window, step, sr, starts)
    assert plan is not None and len(plan) > 1
    for sl in plan:
        rel = starts[sl.i0:sl.i1] - sl.a
        assert int(rel.min()) >= 0
        assert int(rel.max()) + window <= np.iinfo(np.int32).max


def test_release_is_slice_scoped_with_overlapping_bounds(monkeypatch,
                                                         rng):
    """A halo longer than the slice clips adjacent slices to identical
    (a, b) sample bounds; releasing slice k must not evict its
    neighbours' cached buffers (cache keys carry the slice index)."""
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.05")   # 3 s
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "20.0")
    sr = 16000
    window, step = 2 * sr, sr // 2
    wav = (0.05 * rng.standard_normal((1, 10 * sr))).astype(np.float32)
    starts, _ = _chunk_grid(wav.shape[1], window, step, sr)
    plan = plan_slices(wav.shape[1], window, step, sr, starts)
    assert plan is not None and len(plan) >= 2
    assert (plan[0].a, plan[0].b) == (plan[1].a, plan[1].b)
    file = {}
    get_upload, release = slice_uploads(file, wav, plan, sr, starts,
                                        window)
    buf1, _ = get_upload(1)
    get_upload(0)
    release(0)
    keys = _buffer_keys(file["_longfile_uploads"])
    assert keys and all(key[0] == 1 for key in keys)
    buf1_again, _ = get_upload(1)
    assert buf1_again is buf1


def test_retained_upload_budget_share(monkeypatch):
    from pyannote_audio_tpu.core.longfile import retained_upload_bytes_ok
    monkeypatch.setenv("PYANNOTE_TPU_HBM_BUDGET_GB", "6.0")
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "int16")
    assert retained_upload_bytes_ok(2 * 3600 * 16000)          # 2 h
    assert not retained_upload_bytes_ok(30 * 3600 * 16000)     # 30 h
    # the cap follows the transport's cached bytes/sample: f32 halves
    # the admissible duration vs int16, mulaw doubles it
    n = 10 * 3600 * 16000                                      # 10 h
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "f32")
    f32_ok = retained_upload_bytes_ok(n)
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "mulaw")
    assert retained_upload_bytes_ok(n)
    assert not f32_ok


def test_forced_slice_length_beyond_int32_raises(monkeypatch):
    """A forced slice length whose slice-local starts would wrap int32
    must refuse loudly instead of silently gathering wrong audio."""
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "2400")  # 40 h
    sr, window, step = 16000, 10 * 16000, 16000
    n45h = 45 * 3600 * sr
    starts = np.arange(0, n45h - window + step, step, dtype=np.int64)
    with pytest.raises(ValueError, match="SEGMENT_MINUTES"):
        plan_slices(n45h, window, step, sr, starts)


def test_halo_samples_ceils_to_align(monkeypatch):
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "5.0")
    assert halo_samples(16000) >= 5 * 16000


def test_segment_minutes_bad_env_falls_back(monkeypatch):
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "auto")
    with pytest.warns(UserWarning, match="SEGMENT_MINUTES"):
        assert segment_minutes(3600.0) is None  # auto: 1 h fits budget


# ------------------------------------------------------ Inference.slide

@pytest.fixture(scope="module")
def pyannet_model():
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    model = PyanNet(lstm={"hidden_size": 32, "num_layers": 1})
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    return model


@pytest.fixture(scope="module")
def simple_model():
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=1)
    model.build()
    return model


@pytest.fixture(scope="module")
def long_waveform(rng):
    # 31.7 s: several forced slices + a zero-padded tail chunk
    return (0.1 * rng.standard_normal((1, 31 * 16000 + 11200))
            ).astype(np.float32)


def _slide(model, waveform, cache=None):
    inf = Inference(model, duration=2.0, step=0.5, batch_size=8)
    return np.asarray(inf.slide(waveform, 16000, cache=cache).data)


@pytest.mark.parametrize("shared_sinc", ["1", "0"])
def test_slide_sliced_matches_whole_file(pyannet_model, long_waveform,
                                         monkeypatch, shared_sinc):
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_SINC", shared_sinc)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0")
    whole = _slide(pyannet_model, long_waveform)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.15")  # 9 s
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    cache = {}
    sliced = _slide(pyannet_model, long_waveform, cache=cache)
    # plan engaged, and the aggregating path (no later device stage)
    # released every slice buffer as it went
    assert "_fingerprint" in cache.get("_longfile_uploads", {})
    assert not _buffer_keys(cache["_longfile_uploads"])
    assert sliced.shape == whole.shape
    np.testing.assert_allclose(sliced, whole, atol=1e-5)


def test_slide_sliced_matches_plain_gather(simple_model, long_waveform,
                                           monkeypatch):
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0")
    whole = _slide(simple_model, long_waveform)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.15")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    sliced = _slide(simple_model, long_waveform)
    np.testing.assert_allclose(sliced, whole, atol=1e-5)


def test_slide_sliced_matches_whole_at_tail_shortfall(simple_model,
                                                      monkeypatch, rng):
    """End-to-end repro of the tail-pad geometry: the last slice's
    length lands within one tail-shortfall of the 30 s upload bucket, so
    without the starts[i1-1]+window guard the final chunk's gather read
    clamped (wrong) samples instead of zeros."""
    num_samples = 2384160
    wav = (0.1 * rng.standard_normal((1, num_samples))).astype(np.float32)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0")
    whole = _slide(simple_model, wav)
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "1.0")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    sliced = _slide(simple_model, wav)
    np.testing.assert_allclose(sliced, whole, atol=1e-5)


def test_slide_retention_respects_hbm_budget(long_waveform, monkeypatch):
    """On the diarization path (permutation-invariant scores stay in
    HBM for the embedding stage) slice buffers are retained ONLY while
    their total stays a small share of the HBM budget — otherwise the
    retained decoded waveforms would re-grow HBM with file length."""
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=2.0,
        classes=["a", "b"], powerset_max_classes=1,
        permutation_invariant=True)
    model.build()
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.15")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")

    inf = Inference(model, duration=2.0, step=0.5, batch_size=8)
    cache = {}
    inf.slide(long_waveform, 16000, cache=cache)
    assert _buffer_keys(cache["_longfile_uploads"])   # retained: reuse

    monkeypatch.setenv("PYANNOTE_TPU_HBM_BUDGET_GB", "0.000001")
    cache2 = {}
    inf.slide(long_waveform, 16000, cache=cache2)
    assert not _buffer_keys(cache2["_longfile_uploads"])


def test_preload_longfile_uploads_one_slice(pyannet_model, tmp_path,
                                            monkeypatch, rng):
    from pyannote_audio_tpu.core.io import write_wav
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.15")
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "1.0")
    wav = (0.05 * rng.standard_normal((1, 30 * 16000))).astype(np.float32)
    path = tmp_path / "long.wav"
    write_wav(path, wav, 16000)
    inf = Inference(pyannet_model, duration=2.0, step=0.5, batch_size=8)
    file = {"audio": str(path)}
    inf.preload(file)
    assert len(_buffer_keys(file.get("_longfile_uploads", {}))) == 1


# ----------------------------------------------- diarization embeddings

class _TinyWeSpeaker:
    pass


def _tiny_wespeaker():
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        BaseWeSpeakerResNet

    class TinyWeSpeaker(BaseWeSpeakerResNet):
        NUM_BLOCKS = (1, 1, 1, 1)
        BOTTLENECK = False

    model = TinyWeSpeaker()
    model.build()
    return model


def _diarization_pipeline(emb):
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b"], powerset_max_classes=1)
    seg.build()
    return SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering", segmentation_step=0.5,
        segmentation_batch_size=4, embedding_batch_size=4)


@pytest.mark.slow
@pytest.mark.parametrize("shared_trunk", ["1", "0"])
def test_embeddings_sliced_match_whole_file(tmp_path, monkeypatch,
                                            shared_trunk):
    """get_embeddings per-slice front-ends == whole-file buffers.

    Exercises the grouped batch loop (global mask indexing via chunk0,
    translated gather starts, per-group upload release) for both the
    shared-trunk and the shared-fbank/raw fallback paths."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    emb = _tiny_wespeaker()
    file = default_two_speaker_file(tmp_path / "long.wav", duration=40.0)
    monkeypatch.setenv("PYANNOTE_TPU_SHARED_TRUNK", shared_trunk)

    def run(segment_minutes, halo="4.0"):
        monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES",
                           segment_minutes)
        monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", halo)
        pipeline = _diarization_pipeline(emb)
        prep = pipeline.prepare_one(dict(file))
        segs = pipeline.get_segmentations(prep)
        embeddings = pipeline.get_embeddings(prep, segs)
        return np.asarray(embeddings), prep

    whole, _ = run("0")
    # 12 s slices; 4 s halo covers the 2.5 s CMN half-window + trunk RF
    sliced, prep = run("0.2")
    # per-group release keeps at most the in-flight slice cached
    assert len(_buffer_keys(prep.get("_longfile_uploads", {}))) <= 1
    assert sliced.shape == whole.shape
    both = np.isfinite(whole) & np.isfinite(sliced)
    np.testing.assert_array_equal(np.isfinite(whole),
                                  np.isfinite(sliced))
    a, b = whole[both.any(axis=-1)], sliced[both.any(axis=-1)]
    norms = np.minimum(np.linalg.norm(a, axis=1),
                       np.linalg.norm(b, axis=1))
    live = norms > 1e-6  # inactive-speaker rows are zero in both paths
    assert live.any()
    cos = np.sum(a[live] * b[live], axis=1) / (
        np.linalg.norm(a[live], axis=1)
        * np.linalg.norm(b[live], axis=1))
    assert cos.min() > 0.999, cos.min()
    np.testing.assert_allclose(sliced[both], whole[both],
                               atol=5e-3, rtol=5e-3)


@pytest.mark.slow
def test_pipeline_end_to_end_sliced_matches_whole(tmp_path, monkeypatch):
    """Full apply(): identical diarization with and without slicing."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    emb = _tiny_wespeaker()
    file = default_two_speaker_file(tmp_path / "e2e.wav", duration=40.0)

    def run(segment_minutes):
        monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES",
                           segment_minutes)
        monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "4.0")
        pipeline = _diarization_pipeline(emb)
        pipeline.instantiate({
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1}})
        return pipeline(dict(file), max_speakers=3).speaker_diarization

    whole = run("0")
    sliced = run("0.2")
    tracks_w = list(whole.itertracks(yield_label=True))
    tracks_s = list(sliced.itertracks(yield_label=True))
    assert len(tracks_w) == len(tracks_s)
    for (s1, _, l1), (s2, _, l2) in zip(tracks_w, tracks_s):
        assert abs(s1.start - s2.start) < 0.05
        assert abs(s1.end - s2.end) < 0.05
        assert l1 == l2


@pytest.mark.slow
def test_apply_batch_sliced_matches_sequential_and_evicts(tmp_path,
                                                          monkeypatch):
    """Pipelined apply_batch with slicing active: per-file results match
    one-at-a-time apply, and finalize pops _longfile_uploads from each
    file dict so host/HBM state stays bounded across a batch (the
    eviction contract of core/pipeline.py + speaker_diarization.py)."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    emb = _tiny_wespeaker()
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_MINUTES", "0.2")   # 12 s
    monkeypatch.setenv("PYANNOTE_TPU_SEGMENT_HALO_SECONDS", "4.0")
    files = [default_two_speaker_file(tmp_path / f"b{i}.wav",
                                      duration=30.0 + 5.0 * i)
             for i in range(2)]
    for i, f in enumerate(files):
        f["uri"] = f"b{i}"

    pipeline = _diarization_pipeline(emb)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    batch_files = [dict(f) for f in files]
    batch_out = pipeline(batch_files, max_speakers=3)
    seq_out = [pipeline(dict(f), max_speakers=3) for f in files]
    for b, s in zip(batch_out, seq_out):
        assert list(b.speaker_diarization.itertracks(yield_label=True)) \
            == list(s.speaker_diarization.itertracks(yield_label=True))
    for f in batch_files:
        assert "_longfile_uploads" not in f
        assert "_device_waveform" not in f
