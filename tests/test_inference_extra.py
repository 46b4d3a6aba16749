"""Inference engine edge cases: whole window, crop, batch apply."""

from pathlib import Path

import numpy as np
import pytest

import pyannote_audio_tpu as pat
from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                           Specifications)
from pyannote_audio_tpu.core.segment import Segment
from pyannote_audio_tpu.models.embedding.debug import SimpleEmbeddingModel
from pyannote_audio_tpu.models.segmentation.debug import \
    SimpleSegmentationModel

from corpus import default_two_speaker_file


@pytest.fixture(scope="module")
def seg_model():
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    return model


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    return default_two_speaker_file(
        tmp_path_factory.mktemp("inf") / "x.wav")


def test_inference_validation(seg_model):
    """Constructor validation parity (reference tests/inference_test.py:51-77):
    unknown window -> ValueError; step > duration -> ValueError; duration
    mismatch vs specifications -> warning; whole window on a
    frame-resolution model -> warning."""
    with pytest.raises(ValueError):
        pat.Inference(seg_model, window="unknown")
    with pytest.raises(ValueError):
        pat.Inference(seg_model, step=seg_model.specifications.duration + 1)
    with pytest.warns(UserWarning):
        pat.Inference(seg_model,
                      duration=seg_model.specifications.duration + 1,
                      step=0.1)
    with pytest.warns(UserWarning):
        pat.Inference(seg_model, window="whole")


def test_whole_window(corpus_file):
    emb = SimpleEmbeddingModel()
    emb.build()
    inference = pat.Inference(emb, window="whole")
    out = inference(corpus_file)
    assert out.shape == (32,)


def test_crop_segment(seg_model, corpus_file):
    inference = pat.Inference(seg_model, duration=5.0, step=1.0,
                              batch_size=4)
    out = inference.crop(corpus_file, Segment(5.0, 15.0))
    # output window is shifted to the crop start
    assert abs(out.sliding_window.start - 5.0) < 0.1
    assert np.isfinite(out.data).all()


def test_skip_conversion_keeps_powerset(seg_model, corpus_file):
    inference = pat.Inference(seg_model, duration=5.0, step=2.5,
                              batch_size=4, skip_aggregation=True,
                              skip_conversion=True)
    out = inference(corpus_file)
    assert out.data.shape[-1] == 7  # powerset classes, not 3
    # log-probabilities
    np.testing.assert_allclose(np.exp(out.data).sum(-1), 1.0, atol=1e-3)


def test_pipeline_batch_apply(seg_model, tmp_path):
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection
    f1 = default_two_speaker_file(tmp_path / "a.wav")
    f2 = default_two_speaker_file(tmp_path / "b.wav")
    pipeline = VoiceActivityDetection(segmentation=seg_model, batch_size=4)
    pipeline.instantiate({"onset": 0.5, "offset": 0.5,
                          "min_duration_on": 0.0, "min_duration_off": 0.0})
    outputs = pipeline([f1, f2])
    assert len(outputs) == 2
    # duplicate stems / repeated files are legitimate (results are
    # positional; per-file caches live in each prepared dict)
    outputs = pipeline([f1, f1])
    assert len(outputs) == 2
    assert outputs[0] == outputs[1]


def test_pretrained_speaker_embedding_wrapper(corpus_file):
    from pyannote_audio_tpu.pipelines.speaker_verification import \
        PretrainedSpeakerEmbedding
    emb = SimpleEmbeddingModel()
    emb.build()
    wrapper = PretrainedSpeakerEmbedding(emb)
    waveforms = np.random.default_rng(0).standard_normal(
        (2, 1, 16000)).astype(np.float32)
    out = wrapper(waveforms)
    assert out.shape == (2, 32)
    # silent masks -> NaN sentinel
    masks = np.zeros((2, 99), np.float32)
    out = wrapper(waveforms, masks=masks)
    assert np.isnan(out).all()


def test_speaker_embedding_pipeline(seg_model, corpus_file):
    from pyannote_audio_tpu.pipelines.speaker_verification import \
        SpeakerEmbedding
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerEmbedding(embedding=emb, segmentation=seg_model)
    vector = pipeline(corpus_file)
    # 2-D (1, dim) like the reference: cdist(emb1, emb2)[0, 0] works
    assert vector.shape == (1, 32)
    assert np.isfinite(vector).all()
    from scipy.spatial.distance import cdist
    assert cdist(vector, vector, metric="cosine")[0, 0] < 1e-6


def test_encode_then_pad_matches_pad_then_encode(monkeypatch):
    """padded_len appends the SAME codes the old pad-then-encode f32
    path produced, for every transport mode."""
    import jax.numpy as jnp
    from pyannote_audio_tpu.core.inference import _upload_waveform

    rng = np.random.default_rng(0)
    pcm = (rng.integers(-32768, 32768, size=(1, 1000))
           .astype(np.float32) / 32768.0)
    arbitrary = rng.normal(size=(1, 1000)).astype(np.float32) * 0.1
    for wav in (pcm, arbitrary):
        padded_f32 = np.pad(wav, ((0, 0), (0, 240)))
        for mode in ("mulaw", "int16", "f32", "dpcm4"):
            new = np.asarray(_upload_waveform(wav, quant=mode,
                                              padded_len=1240))
            old = np.asarray(_upload_waveform(padded_f32, quant=mode))
            assert new.dtype == old.dtype
            np.testing.assert_array_equal(new, old)


def test_int16_upload_fast_path(seg_model, corpus_file, monkeypatch):
    """PCM16-decoded waveforms ship as int16 (half the relay bytes) with
    bit-exact results; float-valued waveforms fall back to f32."""
    import jax.numpy as jnp
    from pyannote_audio_tpu.core.inference import (_dequantize,
                                                   _upload_waveform)

    # PCM16-derived values: exactly i/32768
    w = (np.arange(-5, 6, dtype=np.float32) / 32768.0)[None]
    up = _upload_waveform(w)
    assert up.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(_dequantize(up)), w)

    # non-representable values keep f32
    w2 = np.array([[0.1, 0.2]], np.float32)
    assert _upload_waveform(w2).dtype == jnp.float32

    # gate off -> always f32
    monkeypatch.setenv("PYANNOTE_TPU_INT16_UPLOAD", "0")
    assert _upload_waveform(w).dtype == jnp.float32
    monkeypatch.delenv("PYANNOTE_TPU_INT16_UPLOAD")

    # end-to-end equivalence on a real PCM16 file
    inference = pat.Inference(seg_model, duration=5.0, step=2.5,
                              batch_size=8)
    out_fast = inference(dict(corpus_file))
    monkeypatch.setenv("PYANNOTE_TPU_INT16_UPLOAD", "0")
    inference2 = pat.Inference(seg_model, duration=5.0, step=2.5,
                               batch_size=8)
    out_f32 = inference2(dict(corpus_file))
    np.testing.assert_array_equal(out_fast.data, out_f32.data)


def test_device_waveform_cache_shared_across_stages(seg_model, tmp_path):
    """Segmentation and embedding stages reuse one device upload when the
    padded shapes agree; results unchanged."""
    import pyannote_audio_tpu.core.inference as I
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    file = default_two_speaker_file(tmp_path / "c.wav")
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    calls = []
    real = I._upload_waveform
    I._upload_waveform = lambda w, **kw: calls.append(w.shape) or real(w, **kw)
    try:
        f = dict(file)
        out_cached = pipeline(f)
        assert "_device_waveform" in f
        uploads_with_cache = len(calls)
        # cache affects only transfer count, not the result
        out_plain = pipeline(dict(file))
    finally:
        I._upload_waveform = real
    assert uploads_with_cache == 1  # single shared upload for both stages
    assert out_cached.speaker_diarization.labels() == \
        out_plain.speaker_diarization.labels()


def test_inference_preload_overlaps_upload(seg_model, tmp_path):
    """Inference.preload pads exactly like slide(): the decode-worker
    upload is the ONLY upload, and outputs are unchanged."""
    import pyannote_audio_tpu.core.inference as I
    file = default_two_speaker_file(tmp_path / "p.wav")
    inference = pat.Inference(seg_model, duration=5.0, step=2.5,
                              batch_size=8)
    baseline = inference(dict(file))

    calls = []
    real = I._upload_waveform
    I._upload_waveform = lambda w, **kw: calls.append(w.shape) or real(w, **kw)
    try:
        f = dict(file)
        inference.preload(f)
        assert len(calls) == 1 and "_device_waveform" in f
        out = inference(f)
        assert len(calls) == 1      # slide() hit the preloaded buffer
    finally:
        I._upload_waveform = real
    np.testing.assert_array_equal(out.data, baseline.data)


def test_pipeline_batch_apply_preloads(seg_model, tmp_path):
    """Streaming batch apply calls preload from the decode worker; results
    match the sequential path."""
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    files = [default_two_speaker_file(tmp_path / f"b{i}.wav")
             for i in range(2)]
    for i, f in enumerate(files):
        f["uri"] = f"b{i}"
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})
    # pipelined apply_batch (the diarization default) matches sequential
    batch_out = pipeline([dict(f) for f in files])
    seq_out = [pipeline(dict(f)) for f in files]
    for b, s in zip(batch_out, seq_out):
        assert b.speaker_diarization.labels() == \
            s.speaker_diarization.labels()

    # pipelines WITHOUT a custom apply_batch use the streaming decode
    # worker, which preloads each file's device upload
    preloaded = []
    orig = pipeline.preload
    pipeline.apply_batch = None        # force the generic streaming path
    pipeline.preload = lambda f: preloaded.append(f.get("uri")) or orig(f)
    stream_out = pipeline([dict(f) for f in files])
    assert preloaded == ["b0", "b1"]
    for b, s in zip(stream_out, seq_out):
        assert b.speaker_diarization.labels() == \
            s.speaker_diarization.labels()


def test_mulaw_upload_quantization(seg_model, tmp_path, monkeypatch):
    """Opt-in PYANNOTE_TPU_UPLOAD_QUANT=mulaw ships uint8 (quarter the
    f32 bytes); decode round-trips at speech-grade SNR and the pipeline
    still produces close scores."""
    import jax.numpy as jnp
    from pyannote_audio_tpu.core.inference import (_dequantize,
                                                   _mulaw_encode,
                                                   _to_pcm16_scale,
                                                   _upload_waveform)
    rng = np.random.default_rng(0)
    t = np.arange(32000) / 16000.0
    speech = (0.3 * np.sin(2 * np.pi * 150 * t)
              + 0.05 * rng.standard_normal(32000)).astype(np.float32)
    wav = speech[None]

    q = _mulaw_encode(wav)
    assert q.dtype == np.uint8
    back = np.asarray(_dequantize(jnp.asarray(q)))
    err = np.sqrt(np.mean((back - wav) ** 2))
    snr_db = 20 * np.log10(np.sqrt(np.mean(wav ** 2)) / (err + 1e-12))
    assert snr_db > 30, snr_db
    # kaldi-scale helper agrees with decode * 32768
    np.testing.assert_allclose(
        np.asarray(_to_pcm16_scale(jnp.asarray(q))), back * 32768.0,
        rtol=1e-6)

    # CPU default stays bit-exact; env opt-in switches the upload dtype
    assert _upload_waveform(wav).dtype != jnp.uint8
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "mulaw")
    assert _upload_waveform(wav).dtype == jnp.uint8

    # end-to-end: scores close to the exact path
    inference = pat.Inference(seg_model, duration=5.0, step=2.5,
                              batch_size=8)
    file = default_two_speaker_file(tmp_path / "m.wav")
    out_q = inference(dict(file))
    monkeypatch.delenv("PYANNOTE_TPU_UPLOAD_QUANT")
    inference2 = pat.Inference(seg_model, duration=5.0, step=2.5,
                               batch_size=8)
    out_exact = inference2(dict(file))
    # outputs are powerset-decoded 0/1 labels: quantization may flip a
    # few borderline frames but the decisions must agree almost always
    flip_rate = np.mean(out_q.data != out_exact.data)
    assert flip_rate < 0.02, flip_rate


def test_upload_quant_mode_resolution(monkeypatch):
    """mu-law transport is the accelerator serving default; env wins;
    CPU stays bit-exact (docs/PARITY.md A/B: DER delta +0.0003)."""
    import jax

    from pyannote_audio_tpu.core import inference as inf

    monkeypatch.delenv("PYANNOTE_TPU_UPLOAD_QUANT", raising=False)
    monkeypatch.delenv("PYANNOTE_TPU_INT16_UPLOAD", raising=False)
    # this suite runs on the CPU backend: default is exact transport
    assert jax.default_backend() == "cpu"
    assert inf._upload_quant_mode() == "int16"
    # legacy gate maps to raw-f32 transport
    monkeypatch.setenv("PYANNOTE_TPU_INT16_UPLOAD", "0")
    assert inf._upload_quant_mode() == "f32"
    monkeypatch.delenv("PYANNOTE_TPU_INT16_UPLOAD")
    # accelerator backend (simulated) defaults to 4-bit DPCM (round 4)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert inf._upload_quant_mode() == "dpcm4"
    # explicit env always wins, both directions
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "int16")
    assert inf._upload_quant_mode() == "int16"
    # ...including over the legacy gate (docs: "bit-exact everywhere")
    monkeypatch.setenv("PYANNOTE_TPU_INT16_UPLOAD", "0")
    assert inf._upload_quant_mode() == "int16"
    monkeypatch.delenv("PYANNOTE_TPU_INT16_UPLOAD")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "mulaw")
    assert inf._upload_quant_mode() == "mulaw"
    # unrecognized values warn once and fall back to bit-exact int16
    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "mu-law")
    import warnings as _w
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        assert inf._upload_quant_mode() == "int16"
    assert any("mu-law" in str(c.message) for c in caught)


def test_separation_forces_exact_transport(monkeypatch):
    """Pipelines whose product is audio override the mu-law default:
    quant='int16' at the upload site wins over the env mode."""
    import jax.numpy as jnp

    from pyannote_audio_tpu.core.inference import _upload_waveform_cached

    monkeypatch.setenv("PYANNOTE_TPU_UPLOAD_QUANT", "mulaw")
    w = (np.arange(-5, 6, dtype=np.float32) / 32768.0)[None]
    cache = {}
    buf = _upload_waveform_cached(w, cache, quant="int16")
    assert buf.dtype == jnp.int16          # NOT uint8
    # the cached entry is keyed by the override, so a later default-mode
    # upload of the same waveform does not reuse the exact buffer
    buf2 = _upload_waveform_cached(w, cache)
    assert buf2.dtype == jnp.uint8


def test_oom_maps_to_actionable_memory_error(seg_model, tmp_path):
    """Device OOM surfaces as MemoryError naming batch_size (parity:
    reference inference.py:201-206)."""
    import pytest
    file = default_two_speaker_file(tmp_path / "o.wav")
    inference = pat.Inference(seg_model, duration=5.0, step=2.5,
                              batch_size=8)

    def boom(*args, **kwargs):
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "1234567890 bytes.")
    inference._jitted_batch = boom
    with pytest.raises(MemoryError, match="batch_size"):
        inference(dict(file))


def test_device_waveform_cache_detects_mutation():
    """A mutated waveform in a reused file dict must not hit the stale
    device buffer (the old 4-point probe missed off-probe mutations)."""
    from pyannote_audio_tpu.core.inference import (_dequantize,
                                                   _upload_waveform_cached)
    wav = np.zeros((1, 20000), np.float32)
    cache = {}
    buf1 = _upload_waveform_cached(wav, cache)
    wav2 = wav.copy()
    wav2[0, 5] = 0.25  # single sample, away from any probe point
    buf2 = _upload_waveform_cached(wav2, cache)
    assert not np.array_equal(np.asarray(_dequantize(buf2)),
                              np.asarray(_dequantize(buf1)))
    np.testing.assert_array_equal(np.asarray(_dequantize(buf2)), wav2)
    # unchanged waveform still hits the cache
    buf3 = _upload_waveform_cached(wav2, cache)
    assert buf3 is buf2


def test_mulaw_lut_encode_matches_formula():
    """PCM16-exact float input takes the LUT fast path; its output is
    bit-identical to the companding formula. Non-exact floats fall back
    to the formula."""
    from pyannote_audio_tpu.core.inference import _mulaw_encode

    rng = np.random.default_rng(1)
    i16 = rng.integers(-32768, 32768, size=(1, 50000), dtype=np.int16)
    exact = (i16 / np.float32(32768.0)).astype(np.float32)

    def formula(w):
        x = np.clip(w, -1.0, 1.0)
        y = np.sign(x) * np.log1p(255.0 * np.abs(x)) / np.log1p(255.0)
        return np.round((y + 1.0) * 127.5).astype(np.uint8)

    assert np.array_equal(_mulaw_encode(exact), formula(exact))
    # resampled/non-exact floats (formula fallback) still encode sanely
    fuzzy = exact + np.float32(1e-5)
    out = _mulaw_encode(fuzzy)
    assert out.dtype == np.uint8
    assert np.array_equal(out, formula(fuzzy))
