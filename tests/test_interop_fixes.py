"""Regression tests for interop/runtime review fixes (round 3, session 5,
pass 5): ONNX signed varints, VBx prior seeding, SDK hook contract,
presigned uploads without the API bearer, native decoder clamping."""

import struct

import numpy as np
import pytest


def test_onnx_negative_int64_initializer():
    """int64 varints are two's complement: a -1 Reshape dim must decode
    as -1, not 2**64-1 (which overflows numpy int64)."""
    from pyannote_audio_tpu.utils.onnx import _parse_tensor

    def varint(value):
        # protobuf encodes negative int64 as 10-byte two's complement
        value &= (1 << 64) - 1
        out = b""
        while True:
            byte = value & 0x7F
            value >>= 7
            if value:
                out += bytes([byte | 0x80])
            else:
                out += bytes([byte])
                return out

    def field(num, wire, payload):
        key = varint((num << 3) | wire)
        if wire == 2:
            return key + varint(len(payload)) + payload
        return key + payload

    packed = varint(-1) + varint(3) + varint(-128)
    tensor = (field(1, 0, varint(3))          # dims: [3]
              + field(2, 0, varint(7))        # data_type: INT64
              + field(8, 2, b"shape")         # name
              + field(7, 2, packed))          # int64_data
    name, arr = _parse_tensor(tensor)
    assert name == "shape"
    np.testing.assert_array_equal(arr, [-1, 3, -128])


def test_vbx_vector_pi_seeds_priors():
    """A vector pi must be USED as the initial speaker priors (reference
    vbx.py:87-119), not just define the speaker count."""
    from pyannote_audio_tpu.utils.vbx import VBx

    rng = np.random.default_rng(0)
    X = rng.standard_normal((40, 4))
    Phi = np.abs(rng.standard_normal(4)) + 0.5
    skewed = np.array([0.97, 0.02, 0.01])
    g1, _, _ = VBx(X, Phi, pi=skewed, maxIters=1)
    g2, _, _ = VBx(X, Phi, pi=3, maxIters=1)
    # one EM step from identical gamma init but different priors must
    # produce different responsibilities
    assert not np.allclose(g1, g2)


def test_sdk_call_path_accepts_hook():
    """Base Pipeline.__call__ always passes hook= — SDK.apply must accept
    it (the documented `pipeline(path)` usage crashed with TypeError)."""
    import inspect
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK

    assert "hook" in inspect.signature(SDK.apply).parameters


def test_serve_presigned_put_needs_no_bearer(tmp_path):
    """The presigned upload URL is query-signed: a PUT without the API
    bearer header must succeed (real presigned storage rejects double
    auth), and a PUT with neither sig nor bearer must be rejected."""
    import json
    import urllib.request
    from pyannote_audio_tpu.serve import DiarizationServer

    class _FakePipeline:
        def __call__(self, files, **kwargs):
            from pyannote_audio_tpu.core.annotation import Annotation
            return ([Annotation(uri="x") for _ in files]
                    if isinstance(files, list) else Annotation(uri="x"))

    server = DiarizationServer(_FakePipeline(), token="secret").start()
    try:
        api = server.api_url
        req = urllib.request.Request(
            f"{api}/media/input",
            data=json.dumps({"url": "media://t.wav"}).encode(),
            method="POST", headers={
                "Authorization": "Bearer secret",
                "Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            presigned = json.loads(r.read())["url"]
        assert "?sig=" in presigned
        put = urllib.request.Request(presigned, data=b"\0\1",
                                     method="PUT")
        with urllib.request.urlopen(put) as r:    # NO bearer header
            assert r.status == 200
        # signature is single-use: a replay without bearer fails
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(urllib.request.Request(
                presigned, data=b"\0\1", method="PUT"))
    finally:
        server.shutdown()


def test_native_decode_clamps_to_data_chunk(tmp_path):
    """Reads past the data chunk zero-fill instead of decoding trailing
    metadata bytes as audio; the return value reports REAL frames."""
    from pyannote_audio_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")

    sr = 16000
    pcm = (np.sin(np.arange(100) * 0.1) * 20000).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + b"LIST" + struct.pack("<I", 8) + b"INFOjunk")
    path = tmp_path / "trail.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)

    out = native.wav_decode(str(path), frame_offset=50, num_frames=100)
    assert out.shape == (1, 100)
    np.testing.assert_array_equal(out[0, 50:], 0.0)   # past data: zeros
    assert np.any(out[0, :50] != 0.0)


def test_native_rejects_corrupt_fmt_size(tmp_path):
    from pyannote_audio_tpu import native
    if not native.available():
        pytest.skip("native lib unavailable")

    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", 0xFFFFFFFF) + fmt
            + b"data" + struct.pack("<I", 4) + b"\0\0\0\0")
    path = tmp_path / "bad.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    # must fail cleanly (None), not abort the process on bad_alloc
    assert native.wav_info(str(path)) is None
