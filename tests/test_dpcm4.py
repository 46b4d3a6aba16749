"""4-bit DPCM upload transport: host encode (native + numpy) and
device decode (core/inference.py).

The codec is an upload-bytes optimization with no reference analogue
(the reference ships f32 tensors to CUDA over PCIe; our TPU sits behind
a relay where upload bytes are a hard serial cost — CLAUDE.md). Its
contract: reconstruction error <= ceil(s/2) per sample where s is the
per-block scale, silence encodes to exact zeros, and the decoded buffer
is bit-identical between the native C++ and numpy encoders.
"""

import numpy as np
import pytest

from pyannote_audio_tpu.core.inference import (
    _DPCM4_BLOCK,
    _DPCM4_ROW,
    _dpcm4_device_decode,
    _dpcm4_encode_numpy,
    _upload_waveform,
)


def speechlike(seconds: float = 10.0, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    x = 0.01 * rng.standard_normal(t.size) \
        + 0.3 * np.sin(2 * np.pi * 220 * t) \
        * (np.sin(2 * np.pi * 0.3 * t) > 0)
    x[: t.size // 10] = 0.0
    return (np.round(np.clip(x, -1, 1) * 32768).clip(-32768, 32767)
            / np.float32(32768)).astype(np.float32)


def reference_decode(rows: np.ndarray, out_len: int) -> np.ndarray:
    """Independent numpy reconstruction of the block stream."""
    packed = rows[:, : _DPCM4_BLOCK // 2].astype(np.int32)
    lo = (packed & 15) - 8
    hi = (packed >> 4) - 8
    c = np.stack([lo, hi], axis=-1).reshape(rows.shape[0], _DPCM4_BLOCK)
    meta = rows[:, _DPCM4_BLOCK // 2:].copy().view(np.int16)
    s = meta[:, 0].astype(np.int64)
    x0 = meta[:, 1].astype(np.int64)
    xhat = x0[:, None] + s[:, None] * np.cumsum(c, axis=1)
    return np.clip(xhat, -32768, 32767).astype(np.int16).reshape(-1)[
        :out_len]


def test_roundtrip_error_bound():
    x = speechlike()
    blocks = -(-x.size // _DPCM4_BLOCK) * _DPCM4_BLOCK
    rows = _dpcm4_encode_numpy(x, blocks)
    assert rows.shape == (blocks // _DPCM4_BLOCK, _DPCM4_ROW)
    dec = reference_decode(rows, x.size)
    i16 = np.round(x * 32768).astype(np.int32)
    err = np.abs(dec.astype(np.int32) - i16)
    s = np.repeat(rows[:, 128:].copy().view(np.int16)[:, 0]
                  .astype(np.int32), _DPCM4_BLOCK)[: x.size]
    # K = round-half-up(x/s) -> |x - s*K| <= s/2 (+1 for the int16 clip
    # of x0 at full scale)
    assert np.all(2 * err <= s + 1)
    # speech-band SNR sanity (mu-law is ~38 dB; dpcm4 lands near it)
    sig = np.sum(i16.astype(np.float64) ** 2)
    noise = np.sum((dec.astype(np.float64) - i16) ** 2)
    assert 10 * np.log10(sig / noise) > 28.0


def test_silence_is_exact_zero():
    x = np.zeros(4096, np.float32)
    rows = _dpcm4_encode_numpy(x, 4096)
    dec = reference_decode(rows, 4096)
    assert np.array_equal(dec, np.zeros(4096, np.int16))


def test_device_decode_matches_reference():
    x = speechlike(seconds=3.0, seed=1)
    blocks = -(-x.size // _DPCM4_BLOCK) * _DPCM4_BLOCK
    rows = _dpcm4_encode_numpy(x, blocks)
    dev = np.asarray(_dpcm4_device_decode(rows, x.size))
    assert dev.dtype == np.int16 and dev.shape == (1, x.size)
    assert np.array_equal(dev[0], reference_decode(rows, x.size))


def test_native_encoder_bit_identical():
    from pyannote_audio_tpu import native

    x = speechlike(seconds=5.0, seed=2)
    blocks = -(-x.size // _DPCM4_BLOCK) * _DPCM4_BLOCK
    rows_nat = native.dpcm4_encode(x, blocks)
    if rows_nat is None:
        pytest.skip("native library unavailable")
    assert np.array_equal(rows_nat, _dpcm4_encode_numpy(x, blocks))


def test_upload_waveform_mode():
    x = speechlike(seconds=2.0, seed=3)
    buf = np.asarray(_upload_waveform(x[None], quant="dpcm4"))
    assert buf.dtype == np.int16 and buf.shape == (1, x.size)
    # encode-then-pad: tail blocks decode as digital silence
    padded = np.asarray(_upload_waveform(x[None], quant="dpcm4",
                                         padded_len=x.size + 999))
    assert padded.shape == (1, x.size + 999)
    assert np.array_equal(padded[0, : x.size], buf[0])
    assert np.all(padded[0, x.size + _DPCM4_BLOCK:] == 0)
    # non-mono input falls back to the mu-law codec
    stereo = np.asarray(_upload_waveform(np.repeat(x[None], 2, 0),
                                         quant="dpcm4"))
    assert stereo.dtype == np.uint8


def test_adversarial_rows_decode_totally():
    # decode is total over arbitrary bytes: no overflow past int16 and
    # no shape surprises (transport buffers are produced locally, but
    # the decoder should still be robust to corruption)
    rng = np.random.default_rng(4)
    rows = rng.integers(0, 256, size=(7, _DPCM4_ROW), dtype=np.uint8)
    out = np.asarray(_dpcm4_device_decode(rows, 7 * _DPCM4_BLOCK))
    assert out.dtype == np.int16 and out.shape == (1, 7 * _DPCM4_BLOCK)


def test_inference_end_to_end_close_to_exact():
    """Full Inference run with dpcm4 transport stays close to f32."""
    import pyannote_audio_tpu as pat
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    sr = 16000
    x = speechlike(seconds=12.0, seed=5)
    model = SimpleSegmentationModel()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"])
    model.build()
    inf = pat.Inference(model, duration=5.0, step=2.5, batch_size=4)
    file = {"waveform": x[None], "sample_rate": sr}
    import os
    out_exact = inf(dict(file)).data
    os.environ["PYANNOTE_TPU_UPLOAD_QUANT"] = "dpcm4"
    try:
        out_dpcm = inf(dict(file)).data
    finally:
        os.environ.pop("PYANNOTE_TPU_UPLOAD_QUANT", None)
    assert np.isfinite(out_dpcm).all()
    assert np.max(np.abs(out_dpcm - out_exact)) < 0.05


def test_default_falls_back_to_mulaw_without_native(monkeypatch):
    """The accelerator DEFAULT requires the C++ encoder (the numpy twin
    is 3-10x slower at scale); without it the resolver warns once and
    uses mu-law. Explicit =dpcm4 still works via the numpy fallback."""
    import jax

    import pyannote_audio_tpu.core.inference as inf

    monkeypatch.delenv("PYANNOTE_TPU_UPLOAD_QUANT", raising=False)
    monkeypatch.delenv("PYANNOTE_TPU_INT16_UPLOAD", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(inf, "_NATIVE_DPCM4", False)
    inf._WARNED_QUANT_MODES.discard("dpcm4-native")
    with pytest.warns(UserWarning, match="native dpcm4"):
        assert inf._upload_quant_mode() == "mulaw"
    monkeypatch.setattr(inf, "_NATIVE_DPCM4", True)
    assert inf._upload_quant_mode() == "dpcm4"
