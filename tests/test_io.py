"""Audio io tests: WAV decode, resample, crop (reference tests/io_test.py)."""

import numpy as np
import pytest

from pyannote_audio_tpu import Audio, Segment
from pyannote_audio_tpu.core.io import get_audio_metadata, write_wav


@pytest.fixture(scope="module")
def wav_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    sr = 16000
    waveform = (0.1 * rng.standard_normal((1, sr * 3))).astype(np.float32)
    path = tmp_path_factory.mktemp("audio") / "test.wav"
    write_wav(path, waveform, sr)
    return str(path), waveform, sr


def test_metadata(wav_file):
    path, waveform, sr = wav_file
    meta = get_audio_metadata(path)
    assert meta.sample_rate == sr
    assert meta.num_samples == waveform.shape[1]
    assert meta.duration == pytest.approx(3.0)


def test_decode_roundtrip(wav_file):
    path, waveform, sr = wav_file
    audio = Audio(sample_rate=sr, mono="downmix")
    decoded, rate = audio(path)
    assert rate == sr
    assert decoded.shape == waveform.shape
    np.testing.assert_allclose(decoded, waveform, atol=1.0 / 32767)


def test_in_memory(wav_file):
    _, waveform, sr = wav_file
    audio = Audio(sample_rate=sr)
    decoded, rate = audio({"waveform": waveform, "sample_rate": sr})
    np.testing.assert_array_equal(decoded, waveform)


def test_resample(wav_file):
    path, waveform, sr = wav_file
    audio = Audio(sample_rate=8000)
    decoded, rate = audio(path)
    assert rate == 8000
    assert decoded.shape[1] == waveform.shape[1] // 2


def test_downmix(tmp_path):
    sr = 16000
    stereo = np.stack([np.ones(sr), -np.ones(sr)]).astype(np.float32) * 0.5
    path = tmp_path / "stereo.wav"
    write_wav(path, stereo, sr)
    audio = Audio(sample_rate=sr, mono="downmix")
    decoded, _ = audio(str(path))
    assert decoded.shape[0] == 1
    np.testing.assert_allclose(decoded, 0.0, atol=1e-4)


def test_crop(wav_file):
    path, waveform, sr = wav_file
    audio = Audio(sample_rate=sr)
    crop, rate = audio.crop(path, Segment(1.0, 2.0))
    assert crop.shape == (1, sr)
    np.testing.assert_allclose(crop, waveform[:, sr:2 * sr],
                               atol=1.0 / 32767)


def test_crop_pad(wav_file):
    path, waveform, sr = wav_file
    audio = Audio(sample_rate=sr)
    crop, _ = audio.crop(path, Segment(2.5, 4.0), mode="pad")
    assert crop.shape == (1, int(1.5 * sr))
    assert np.all(crop[:, sr // 2:] == 0)
    with pytest.raises(ValueError):
        audio.crop(path, Segment(2.5, 4.0), mode="raise")


def test_crop_fixed_duration(wav_file):
    path, _, sr = wav_file
    audio = Audio(sample_rate=sr)
    crop, _ = audio.crop(path, Segment(0.5, 1.7), duration=2.0, mode="pad")
    assert crop.shape == (1, 2 * sr)


def test_validate_file(wav_file):
    path, waveform, sr = wav_file
    assert Audio.validate_file(path)["uri"] == "test"
    d = Audio.validate_file({"waveform": waveform, "sample_rate": sr})
    assert d["uri"] == "waveform"
    with pytest.raises(ValueError):
        Audio.validate_file({"waveform": waveform})  # missing sample_rate
    with pytest.raises(ValueError):
        Audio.validate_file(42)


def test_audio_from_file_like(tmp_path):
    """File-like (BytesIO) loading + crop parity
    (reference tests/io_test.py:66-88)."""
    import io as _io
    from pyannote_audio_tpu.core.io import Audio, write_wav
    from pyannote_audio_tpu.core.segment import Segment
    sr = 16000
    wav = (0.1 * np.sin(2 * np.pi * 440 *
                        np.arange(sr * 2) / sr)).astype(np.float32)[None]
    path = tmp_path / "x.wav"
    write_wav(path, wav, sr)
    audio = Audio(sample_rate=sr)

    with open(path, "rb") as f:
        blob = _io.BytesIO(f.read())
    loaded, rate = audio(blob)
    assert rate == sr and loaded.shape == wav.shape

    blob.seek(0)
    cropped, _ = audio.crop(blob, Segment(0.5, 1.0))
    assert cropped.shape == (1, sr // 2)
    # write_wav stores PCM16: 1/32768 quantization
    np.testing.assert_allclose(cropped[0], wav[0, sr // 2:sr], atol=1e-4)


# ------------------------------------------------------------ non-WAV decode

def _codec_or_skip():
    from pyannote_audio_tpu.native import codec_available
    if not codec_available():
        pytest.skip("libpat_codec.so (FFmpeg) not available")


@pytest.mark.parametrize("ext", ["flac", "mp3", "ogg"])
def test_non_wav_roundtrip(tmp_path, ext):
    """FLAC/MP3/OGG decode through Audio (parity: reference io.py:42-56
    decodes any format via torchcodec/FFmpeg)."""
    _codec_or_skip()
    from pyannote_audio_tpu.native import codec_encode

    sr = 16000
    t = np.arange(sr * 3) / sr
    wav = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    path = tmp_path / f"tone.{ext}"
    assert codec_encode(path, wav, sr)

    audio = Audio(sample_rate=sr, mono="downmix")
    out, rate = audio(str(path))
    assert rate == sr
    assert out.shape[0] == 1
    # lossy codecs may shift a little; FLAC is sample-exact vs 16-bit
    if ext == "flac":
        q = np.round(wav * 32768) / 32768
        n = min(out.shape[1], wav.shape[1])
        np.testing.assert_allclose(out[0, :n], q[0, :n], atol=1e-6)
    else:
        assert abs(out.shape[1] - wav.shape[1]) < sr // 10


def test_non_wav_metadata_and_duration(tmp_path):
    _codec_or_skip()
    from pyannote_audio_tpu.core.io import get_audio_metadata
    from pyannote_audio_tpu.native import codec_encode

    sr = 16000
    wav = np.zeros((1, sr * 2), np.float32)
    path = tmp_path / "silence.flac"
    assert codec_encode(path, wav, sr)
    meta = get_audio_metadata(str(path))
    assert meta.sample_rate == sr
    assert meta.num_channels == 1
    assert abs(meta.duration - 2.0) < 0.1
    assert meta.encoding == "compressed"


def test_non_wav_crop_caches_decode(tmp_path):
    """crop() on compressed audio decodes once, caches, slices exactly."""
    _codec_or_skip()
    from pyannote_audio_tpu.core.segment import Segment
    from pyannote_audio_tpu.native import codec_encode

    sr = 16000
    rng = np.random.default_rng(0)
    wav = np.round(0.2 * rng.standard_normal((1, sr * 4)) * 32768) / 32768
    wav = wav.astype(np.float32)
    path = tmp_path / "noise.flac"
    assert codec_encode(path, wav, sr)

    audio = Audio(sample_rate=sr, mono="downmix")
    file = {"audio": str(path), "uri": "noise"}
    crop1, rate = audio.crop(file, Segment(1.0, 2.0))
    assert "_codec_waveform" in file       # cached for later crops
    np.testing.assert_allclose(crop1[0], wav[0, sr:2 * sr], atol=1e-6)
    crop2, _ = audio.crop(file, Segment(2.0, 3.0))
    np.testing.assert_allclose(crop2[0], wav[0, 2 * sr:3 * sr], atol=1e-6)


def test_unreadable_format_raises_actionable_error(tmp_path):
    path = tmp_path / "not_audio.xyz"
    path.write_bytes(b"this is definitely not audio content")
    audio = Audio(sample_rate=16000)
    with pytest.raises(ValueError):
        audio(str(path))


def test_unicode_filenames(tmp_path):
    """Decode + ranged crop + sliding inference on a unicode path
    (parity: the reference corpus deliberately includes trñ00.wav)."""
    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    sr = 16000
    rng = np.random.default_rng(0)
    wav = np.round(0.2 * rng.standard_normal((1, sr * 6)) * 32768) / 32768
    path = tmp_path / "trñ00 — tést.wav"
    write_wav(path, wav.astype(np.float32), sr)

    audio = Audio(sample_rate=sr, mono="downmix")
    crop, _ = audio.crop({"audio": str(path)}, Segment(1.0, 2.0))
    np.testing.assert_allclose(crop[0], wav[0, sr:2 * sr], atol=2e-5)

    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()
    out = pat.Inference(model, duration=5.0, step=1.0,
                        batch_size=4)(str(path))
    assert np.isfinite(out.data).all()
