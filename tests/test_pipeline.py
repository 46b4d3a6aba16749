"""Diarization / VAD pipeline tests on the synthetic corpus."""

from pathlib import Path

import numpy as np
import pytest
import yaml

import pyannote_audio_tpu as pat
from pyannote_audio_tpu.core.model import Problem, Resolution, Specifications
from pyannote_audio_tpu.core.segment import (Segment, SlidingWindow,
                                             SlidingWindowFeature)
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel
from pyannote_audio_tpu.pipelines.clustering import (AgglomerativeClustering,
                                                     KMeansClustering)
from pyannote_audio_tpu.pipelines.speaker_diarization import (
    DiarizeOutput, SpeakerDiarization)
from pyannote_audio_tpu.pipelines.utils.diarization import (
    SpeakerDiarizationMixin, set_num_speakers)

from corpus import default_two_speaker_file


@pytest.fixture(scope="module")
def seg_model():
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["spk0", "spk1", "spk2"], powerset_max_classes=2)
    model.build()
    return model


@pytest.fixture(scope="module")
def emb_model():
    model = SimpleEmbeddingModel()
    model.build()
    return model


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    return default_two_speaker_file(
        tmp_path_factory.mktemp("corpus") / "two_speakers.wav")


# ------------------------------------------------------------ helpers

def test_set_num_speakers():
    assert set_num_speakers(num_speakers=3) == (3, 3, 3)
    assert set_num_speakers(min_speakers=2) == (None, 2, np.inf)
    assert set_num_speakers(min_speakers=2, max_speakers=2) == (2, 2, 2)
    with pytest.raises(ValueError):
        set_num_speakers(min_speakers=5, max_speakers=2)


def test_speaker_count_synthetic():
    # 3 chunks of 10 frames, 2 speakers; constant activity
    window = SlidingWindow(duration=1.0, step=0.5)
    data = np.zeros((3, 10, 2), np.float32)
    data[:, :, 0] = 1.0          # speaker 0 always active
    data[1, :, 1] = 1.0          # speaker 1 active in chunk 1 only
    swf = SlidingWindowFeature(data, window)
    frames = SlidingWindow(duration=0.1, step=0.1)
    count = SpeakerDiarizationMixin.speaker_count(swf, frames,
                                                  warm_up=(0.0, 0.0))
    assert count.data.max() == 2
    # last frame lies beyond the chunk extent -> missing=0 (ref parity)
    assert count.data[:-1].min() >= 1


def test_to_diarization_count_constraint():
    window = SlidingWindow(duration=1.0, step=1.0)
    seg = np.zeros((1, 10, 3), np.float32)
    seg[0, :, 0] = 0.9
    seg[0, :, 1] = 0.6
    seg[0, :, 2] = 0.3
    swf = SlidingWindowFeature(seg, window)
    frames = SlidingWindow(duration=0.1, step=0.1)
    count = SlidingWindowFeature(np.full((10, 1), 2, np.uint8), frames)
    diar = SpeakerDiarizationMixin.to_diarization(swf, count)
    # exactly the 2 highest-scoring speakers per frame
    assert (diar.data.sum(axis=1) == 2).all()
    assert diar.data[:, 2].sum() == 0


def test_optimal_mapping_annotation():
    ref = pat.Annotation(uri="x")
    ref[Segment(0, 5)] = "A"
    ref[Segment(5, 10)] = "B"
    hyp = ref.rename_labels({"A": "0", "B": "1"})
    mapped = SpeakerDiarizationMixin.optimal_mapping(ref, hyp)
    assert mapped.labels() == ["A", "B"]


# ------------------------------------------------------------ clustering

def _fake_embeddings(num_chunks=20, num_speakers=3, dim=16, n_clusters=2):
    rng = np.random.default_rng(0)
    centers = rng.standard_normal((n_clusters, dim)) * 5
    emb = np.zeros((num_chunks, num_speakers, dim))
    truth = np.zeros((num_chunks, num_speakers), int)
    for c in range(num_chunks):
        for s in range(num_speakers):
            k = (c + s) % n_clusters
            truth[c, s] = k
            emb[c, s] = centers[k] + 0.1 * rng.standard_normal(dim)
    seg = np.zeros((num_chunks, 10, num_speakers), np.float32)
    # all speakers active and alone "enough": stagger activity
    for s in range(num_speakers):
        seg[:, s * 3:(s + 1) * 3, s] = 1.0
    return emb, truth, SlidingWindowFeature(
        seg, SlidingWindow(duration=1.0, step=0.5))


def test_agglomerative_clustering_recovers_clusters():
    emb, truth, seg = _fake_embeddings()
    pipeline = AgglomerativeClustering()
    pipeline.instantiate({"method": "centroid", "threshold": 0.5,
                          "min_cluster_size": 1})
    hard, soft, centroids = pipeline(embeddings=emb, segmentations=seg)
    assert centroids.shape[0] == 2
    # clustering is label-invariant: check co-membership matches truth
    a = hard.reshape(-1)
    b = truth.reshape(-1)
    same_ours = a[:, None] == a[None, :]
    same_truth = b[:, None] == b[None, :]
    assert (same_ours == same_truth).mean() > 0.99


def test_agglomerative_forced_num_clusters():
    emb, truth, seg = _fake_embeddings(n_clusters=3)
    pipeline = AgglomerativeClustering()
    pipeline.instantiate({"method": "centroid", "threshold": 0.1,
                          "min_cluster_size": 1})
    hard, _, centroids = pipeline(embeddings=emb, segmentations=seg,
                                  num_clusters=3)
    assert centroids.shape[0] == 3


def test_kmeans_clustering():
    emb, truth, seg = _fake_embeddings()
    pipeline = KMeansClustering()
    pipeline.instantiate({})
    hard, soft, centroids = pipeline(embeddings=emb, segmentations=seg,
                                     num_clusters=2)
    assert centroids.shape[0] == 2


def test_clustering_single_cluster_early_exit():
    emb, _, seg = _fake_embeddings(n_clusters=1)
    pipeline = AgglomerativeClustering()
    pipeline.instantiate({"method": "centroid", "threshold": 0.5,
                          "min_cluster_size": 1})
    hard, soft, centroids = pipeline(embeddings=emb, segmentations=seg,
                                     num_clusters=1)
    assert (hard == 0).all()
    assert centroids.shape[0] == 1


# ------------------------------------------------------------ end-to-end

def test_diarization_pipeline_end_to_end(seg_model, emb_model, corpus_file):
    pipeline = SpeakerDiarization(
        segmentation=seg_model,
        embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8,
        segmentation_batch_size=8,
    )
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1},
    })
    steps = []

    def hook(name, artifact, file=None, total=None, completed=None):
        if not steps or steps[-1] != name:
            steps.append(name)

    output = pipeline(corpus_file, max_speakers=3, hook=hook)
    assert isinstance(output, DiarizeOutput)
    diar = output.speaker_diarization
    assert isinstance(diar, pat.Annotation)
    assert "segmentation" in steps
    # speakers get renamed to reference labels (annotation present)
    # or stay within detected clusters
    assert len(diar.labels()) <= 3
    # exclusive diarization has no overlap
    excl = output.exclusive_speaker_diarization
    timeline = excl.get_timeline()
    for i, s1 in enumerate(timeline):
        for s2 in list(timeline)[i + 1:]:
            assert (s1 & s2).duration < 1e-6


def test_pipelined_apply_batch_matches_sequential(seg_model, emb_model,
                                                  tmp_path):
    """apply_batch stages device work ahead (stage_ahead files deep) and
    must produce byte-identical annotations to one-at-a-time apply —
    including a short quiet file mid-batch (pad + different grid)."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file, make_file
    from pyannote_audio_tpu.core.io import write_wav

    files = [default_two_speaker_file(tmp_path / f"s{i}.wav")
             for i in range(3)]
    # short quiet file mid-batch (different chunk-grid + pad path)
    quiet = 0.001 * np.random.default_rng(0).standard_normal(
        (1, 16000 * 12)).astype(np.float32)
    write_wav(tmp_path / "quiet.wav", quiet, 16000)
    files.insert(1, {"uri": "quiet", "audio": str(tmp_path
                                                  / "quiet.wav")})
    for i, f in enumerate(files):
        f["uri"] = f"u{i}"

    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    batch_out = pipeline([dict(f) for f in files])
    seq_out = [pipeline(dict(f)) for f in files]
    assert len(batch_out) == 4
    for b, s in zip(batch_out, seq_out):
        assert list(b.speaker_diarization.itertracks(yield_label=True)) \
            == list(s.speaker_diarization.itertracks(yield_label=True))
        assert list(b.exclusive_speaker_diarization.itertracks(
            yield_label=True)) == list(
            s.exclusive_speaker_diarization.itertracks(yield_label=True))


def test_warmup_precompiles_and_leaves_results_unchanged(seg_model,
                                                         emb_model,
                                                         corpus_file):
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    pipeline.warmup(duration=30.0, max_speakers=3)
    out = pipeline(dict(corpus_file), max_speakers=3)
    assert len(out.speaker_diarization.labels()) <= 3


@pytest.mark.slow
def test_diarization_pipeline_with_ssl_and_xvector(tmp_path):
    """Full pipeline with an SSL (SSeRiouSS) segmentation model and an
    x-vector MFCC embedder — exercises the staged apply with a
    transformer trunk and the plain (non-shared-trunk) embedding gather
    path."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.xvector import XVectorMFCC
    from pyannote_audio_tpu.models.segmentation.sseriouss import SSeRiouSS

    seg = SSeRiouSS(wav2vec={"hidden": 32, "layers": 1, "heads": 4,
                             "ffn": 64, "rel_pos_bias": False},
                    lstm={"hidden_size": 16, "num_layers": 1},
                    linear={"hidden_size": 16, "num_layers": 1})
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    seg.build()
    emb = XVectorMFCC(dimension=32)
    emb.build()

    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=4, embedding_batch_size=4)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    file = default_two_speaker_file(tmp_path / "ssl.wav")
    out = pipeline(dict(file), max_speakers=3)
    assert isinstance(out, DiarizeOutput)
    assert 1 <= len(out.speaker_diarization.labels()) <= 3
    assert out.speaker_embeddings is not None


def test_diarization_pipeline_legacy_mode(seg_model, emb_model, corpus_file):
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model, legacy=True,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1},
    })
    output = pipeline(corpus_file, num_speakers=2)
    assert isinstance(output, pat.Annotation)


def test_vad_pipeline(seg_model, corpus_file):
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection
    pipeline = VoiceActivityDetection(segmentation=seg_model, batch_size=8)
    pipeline.instantiate({"onset": 0.5, "offset": 0.5,
                          "min_duration_on": 0.0, "min_duration_off": 0.0})
    speech = pipeline(corpus_file)
    assert isinstance(speech, pat.Annotation)
    assert set(speech.labels()) <= {"SPEECH"}


def test_oracle_clustering_end_to_end(seg_model, corpus_file):
    """OracleClustering derives clusters from the reference annotation."""
    pipeline = SpeakerDiarization(
        segmentation=seg_model,
        embedding=None,
        clustering="OracleClustering",
        segmentation_batch_size=8,
    )
    pipeline.instantiate({"segmentation": {"min_duration_off": 0.0}})
    output = pipeline(dict(corpus_file))
    diar = output.speaker_diarization
    # oracle clustering caps hypothesis speakers at the true count
    assert len(diar.labels()) <= len(corpus_file["annotation"].labels())
    assert "oracle_segmentations" not in corpus_file  # copy untouched


def test_oracle_segmentation_shapes(corpus_file):
    from pyannote_audio_tpu.core.segment import SlidingWindow
    from pyannote_audio_tpu.pipelines.utils.oracle import oracle_segmentation
    window = SlidingWindow(duration=5.0, step=2.5)
    frames = SlidingWindow(duration=0.02, step=0.02)
    oracle = oracle_segmentation(dict(corpus_file), window, frames=frames)
    num_chunks, num_frames, num_speakers = oracle.data.shape
    assert num_speakers == 2
    assert num_frames == 250  # 5s / 0.02
    assert set(np.unique(oracle.data)) <= {0.0, 1.0}
    # ground truth: alice speaks during [1, 5] -> first chunk active
    assert oracle.data[0, :, :].sum() > 0


def test_apply_batch_missing_file_raises_cleanly(seg_model, emb_model,
                                                 tmp_path):
    """The streamed decode worker swallows IO errors; the staging path
    must re-surface them with the real exception, and earlier files in
    the batch still complete."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    good = default_two_speaker_file(tmp_path / "ok.wav")
    good["uri"] = "ok"
    bad = {"uri": "missing", "audio": str(tmp_path / "nope.wav")}

    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    with pytest.raises((ValueError, OSError)):
        pipeline([dict(good), dict(bad)])
    # a clean batch afterwards still works (no poisoned state)
    out = pipeline([dict(good)])
    assert len(out) == 1


def test_apply_batch_mixed_formats(seg_model, emb_model, tmp_path):
    """A WAV + FLAC batch rides the streamed decode worker (FFmpeg path
    for the FLAC) and matches the per-file sequential results."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    from pyannote_audio_tpu.native import codec_available, codec_encode
    if not codec_available():
        pytest.skip("libpat_codec.so (FFmpeg) not available")

    wav_file = default_two_speaker_file(tmp_path / "w.wav")
    wav_file["uri"] = "w"
    # re-encode the same audio as FLAC (sample-exact vs 16-bit)
    from pyannote_audio_tpu.core.io import Audio
    waveform, sr = Audio(sample_rate=16000, mono="downmix")(dict(wav_file))
    assert codec_encode(tmp_path / "f.flac", waveform, sr)
    flac_file = {"uri": "f", "audio": str(tmp_path / "f.flac")}

    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    batch_out = pipeline([dict(wav_file), dict(flac_file)])
    seq = [pipeline(dict(wav_file)), pipeline(dict(flac_file))]
    for b, s in zip(batch_out, seq):
        assert list(b.speaker_diarization.itertracks(yield_label=True)) \
            == list(s.speaker_diarization.itertracks(yield_label=True))


def test_batch_apply_releases_host_waveforms(seg_model, emb_model,
                                             tmp_path):
    """The batch machinery must evict the host waveforms it decoded
    itself (the files list stays alive for the whole batch — ~230 MB
    f32 per audio-hour would otherwise accumulate), while user dicts
    that CAME with a waveform are never touched."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file

    files = [default_two_speaker_file(tmp_path / f"ev{i}.wav")
             for i in range(2)]
    for i, f in enumerate(files):
        f["uri"] = f"ev{i}"
        f.pop("waveform", None)       # path-backed: machinery decodes

    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        embedding_batch_size=8, segmentation_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    out = pipeline(files)
    assert len(out) == 2
    for f in files:
        assert "waveform" not in f, "machinery-decoded waveform retained"
        assert "_device_waveform" not in f
        assert "_batch_decoded" not in f

    # user-provided waveforms survive the batch
    from corpus import default_two_speaker_file as make
    user = make(tmp_path / "user.wav")
    from pyannote_audio_tpu.core.io import Audio
    wav, sr = Audio(sample_rate=16000)(dict(user))
    user_dict = {"uri": "user", "waveform": np.asarray(wav),
                 "sample_rate": sr}
    pipeline([user_dict])
    assert "waveform" in user_dict
