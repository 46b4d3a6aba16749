"""Native C++ audio runtime tests (skipped when the .so is not built)."""

import numpy as np
import pytest

from pyannote_audio_tpu import native
from pyannote_audio_tpu.core.io import write_wav

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="libpat_audio.so not built")


@pytest.fixture(scope="module")
def wav(tmp_path_factory):
    rng = np.random.default_rng(0)
    sr = 16000
    data = (0.1 * rng.standard_normal((1, sr * 2))).astype(np.float32)
    path = tmp_path_factory.mktemp("native") / "x.wav"
    write_wav(path, data, sr)
    return str(path), data, sr


def test_wav_info(wav):
    path, data, sr = wav
    info = native.wav_info(path)
    assert info == (sr, 1, data.shape[1])


def test_wav_decode_matches_numpy(wav):
    path, data, sr = wav
    decoded = native.wav_decode(path)
    assert decoded.shape == data.shape
    np.testing.assert_allclose(decoded, data, atol=1.0 / 32767)


def test_wav_decode_slice(wav):
    path, data, sr = wav
    sliced = native.wav_decode(path, frame_offset=sr, num_frames=sr // 2)
    np.testing.assert_allclose(sliced, data[:, sr:sr + sr // 2],
                               atol=1.0 / 32767)


def test_resample_sine():
    sr_in, sr_out = 48000, 16000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = native.resample(x, sr_in, sr_out)
    assert y.shape[0] == sr_out
    t2 = np.arange(sr_out) / sr_out
    expected = np.sin(2 * np.pi * 440.0 * t2)
    # ignore filter edges
    np.testing.assert_allclose(y[200:-200], expected[200:-200], atol=0.02)


def test_batch_decode_resample(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    truths = []
    for i, sr in enumerate([16000, 16000, 8000]):
        data = (0.1 * rng.standard_normal((1, sr))).astype(np.float32)
        p = tmp_path / f"b{i}.wav"
        write_wav(p, data, sr)
        paths.append(str(p))
        truths.append(data)
    out, lengths = native.batch_decode_resample(paths, 16000,
                                                max_seconds=1.5)
    assert out.shape == (3, 24000)
    assert lengths[0] == 16000 and lengths[2] == 16000  # 8k upsampled
    np.testing.assert_allclose(out[0, :16000], truths[0][0],
                               atol=1.0 / 32767)
    assert np.all(out[0, 16000:] == 0)


def test_audio_uses_native_decode(wav):
    from pyannote_audio_tpu import Audio
    path, data, sr = wav
    decoded, rate = Audio(sample_rate=sr)(path)
    np.testing.assert_allclose(decoded, data, atol=1.0 / 32767)


def test_pipeline_batch_predecode(tmp_path):
    """_apply_batch pre-decodes path-backed files via the C++ pool."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection

    f1 = default_two_speaker_file(tmp_path / "p0.wav")
    f2 = default_two_speaker_file(tmp_path / "p1.wav")
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    pipeline = VoiceActivityDetection(segmentation=model, batch_size=8)
    pipeline.instantiate({"onset": 0.5, "offset": 0.5,
                          "min_duration_on": 0.0, "min_duration_off": 0.0})
    # path-only file dicts -> predecode kicks in
    outputs = pipeline([{"audio": f1["audio"], "uri": "p0"},
                        {"audio": f2["audio"], "uri": "p1"}])
    assert len(outputs) == 2
    # single-file output identical to batch output
    single = pipeline({"audio": f1["audio"], "uri": "p0"})
    assert outputs[0] == single


def test_pipeline_batch_streaming_overlap(tmp_path):
    """The default _apply_batch decodes file N+1 on a worker thread while
    file N runs; machinery-decoded waveforms are evicted after each file
    (bounded memory), user-supplied waveforms are kept, and results match
    single-file runs."""
    import sys
    sys.path.insert(0, "tests")
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.voice_activity_detection import \
        VoiceActivityDetection

    paths = [default_two_speaker_file(tmp_path / f"s{i}.wav")["audio"]
             for i in range(3)]
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    pipeline = VoiceActivityDetection(segmentation=model, batch_size=8)
    pipeline.instantiate({"onset": 0.5, "offset": 0.5,
                          "min_duration_on": 0.0, "min_duration_off": 0.0})

    files = [{"audio": p, "uri": f"s{i}"} for i, p in enumerate(paths)]
    # file 2 arrives with a user-supplied waveform: never evicted
    from pyannote_audio_tpu.core.io import Audio
    wav2, sr2 = Audio(sample_rate=16000, mono="downmix")({"audio": paths[2]})
    files[2]["waveform"], files[2]["sample_rate"] = wav2, sr2
    outputs = pipeline(files)
    assert len(outputs) == 3
    # machinery-decoded waveforms are evicted after finalize so host/HBM
    # use stays bounded for arbitrarily long batches (core/pipeline.py
    # _apply_batch eviction contract); user-supplied ones are kept
    assert all("waveform" not in f and "_device_waveform" not in f
               for f in files[:2])
    assert "waveform" in files[2]
    singles = [pipeline({"audio": p, "uri": f"x{i}"})
               for i, p in enumerate(paths)]
    for batch_out, single in zip(outputs, singles):
        assert [s for s, _, _ in batch_out.itertracks(yield_label=True)] \
            == [s for s, _, _ in single.itertracks(yield_label=True)]
