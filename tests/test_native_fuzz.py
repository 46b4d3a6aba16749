"""Generative fuzz harness for the untrusted audio decode path.

VERDICT r3 item 4: ``serve`` accepts uploads, so every header field the
decoders read is attacker-controlled. A seeded corpus of mutated
WAV/codec containers (truncated chunks, lying sizes, zero channels,
invalid depth/format combinations, EXTENSIBLE edge cases, junk chunks,
random corruption) runs through

  * the pure-python parser/decoder (core/io.py `_parse_wav_header`,
    `_decode_wav_bytes`, `Audio.__call__`),
  * the C++ decoder (native/pat_audio.cc via ctypes `wav_info` /
    `wav_decode` / `batch_decode_resample`),
  * the FFmpeg codec wrapper (native/pat_codec.cc `codec_info` /
    `codec_decode`),

asserting each case either decodes with BOUNDED, mutually consistent
results or fails with a clean error (ValueError / None status) — never a
stray exception class, a crash, a hang, or an allocation larger than the
file itself can justify.

Reference analogue: the reference delegates decode to torchcodec/FFmpeg
(reference core/io.py:42-56) and inherits its fuzzing; our native
decoders need their own.
"""

import struct

import numpy as np
import pytest

from pyannote_audio_tpu import native
from pyannote_audio_tpu.core.io import (Audio, _decode_wav_bytes,
                                        _parse_wav_header,
                                        get_audio_metadata)

SEED = 0x5EED
VALID_PCM_BITS = (8, 16, 24, 32)
VALID_FLOAT_BITS = (32, 64)


# --------------------------------------------------------------------------
# corpus construction
# --------------------------------------------------------------------------

def build_wav(rng, fmt=1, channels=1, rate=16000, bits=16, frames=200,
              extensible=False, junk_before_data=False, trailing_list=True):
    """A structurally valid WAV with the given layout."""
    bpf = channels * (bits // 8)
    data = rng.integers(0, 256, size=frames * bpf, dtype=np.uint8).tobytes()
    if extensible:
        # 40-byte fmt: cbSize=22, valid bits, channel mask, SubFormat GUID
        guid = struct.pack("<H", fmt) + b"\x00\x00" + bytes(range(12))
        fmt_chunk = struct.pack("<HHIIHH", 0xFFFE, channels, rate,
                                rate * bpf, bpf, bits)
        fmt_chunk += struct.pack("<HHI", 22, bits, 0) + guid
    else:
        fmt_chunk = struct.pack("<HHIIHH", fmt, channels, rate,
                                rate * bpf, bpf, bits)
    body = b"WAVE"
    if junk_before_data:
        junk = rng.integers(0, 256, size=12, dtype=np.uint8).tobytes()
        body += b"JUNK" + struct.pack("<I", len(junk)) + junk
    body += b"fmt " + struct.pack("<I", len(fmt_chunk)) + fmt_chunk
    body += b"data" + struct.pack("<I", len(data)) + data
    if trailing_list:
        tag = b"INFOIART" + struct.pack("<I", 4) + b"fuzz"
        body += b"LIST" + struct.pack("<I", len(tag)) + tag
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _patch(raw, offset, packed):
    return raw[:offset] + packed + raw[offset + len(packed):]


def _fmt_body_offset(raw):
    """Byte offset of the fmt chunk body (after id+size), or None."""
    pos = 12
    while pos + 8 <= len(raw):
        if raw[pos:pos + 4] == b"fmt ":
            return pos + 8
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        pos += 8 + size + (size & 1)
    return None


def _data_size_offset(raw):
    """Byte offset of the data chunk's size field, or None."""
    pos = 12
    while pos + 8 <= len(raw):
        if raw[pos:pos + 4] == b"data":
            return pos + 4
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        pos += 8 + size + (size & 1)
    return None


def mutate(raw, rng):
    """One random structural mutation of a valid WAV."""
    kind = rng.integers(0, 13)
    fmt_off = _fmt_body_offset(raw)
    data_off = _data_size_offset(raw)
    if kind == 0:    # truncate anywhere
        return raw[:int(rng.integers(0, len(raw)))]
    if kind == 1:    # random byte corruption
        buf = bytearray(raw)
        for _ in range(int(rng.integers(1, 9))):
            buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        return bytes(buf)
    if kind == 2 and fmt_off:   # zero / absurd channel count
        return _patch(raw, fmt_off + 2, struct.pack(
            "<H", int(rng.choice([0, 0xFFFF, 1000]))))
    if kind == 3 and fmt_off:   # zero / absurd sample rate
        return _patch(raw, fmt_off + 4, struct.pack(
            "<I", int(rng.choice([0, 0xFFFFFFFF]))))
    if kind == 4 and fmt_off:   # invalid bit depth
        return _patch(raw, fmt_off + 14, struct.pack(
            "<H", int(rng.choice([0, 1, 7, 12, 17, 48, 64, 0xFFFF]))))
    if kind == 5 and fmt_off:   # lying block align
        return _patch(raw, fmt_off + 12, struct.pack(
            "<H", int(rng.choice([0, 1, 3, 0xFFFF]))))
    if kind == 6 and data_off:  # lying data size
        return _patch(raw, data_off, struct.pack(
            "<I", int(rng.choice([0, 1, 0x7FFFFFFF, 0xFFFFFFFF]))))
    if kind == 7 and fmt_off:   # lying fmt size
        return _patch(raw, fmt_off - 4, struct.pack(
            "<I", int(rng.choice([0, 2, 15, 0x10000000, 0xFFFFFFFF]))))
    if kind == 8 and fmt_off:   # unknown format code
        return _patch(raw, fmt_off, struct.pack(
            "<H", int(rng.choice([0, 2, 6, 7, 0x1234, 0xFFFE, 0xFFFF]))))
    if kind == 9:    # rename a chunk id to garbage
        target = rng.choice([b"fmt ", b"data", b"RIFF", b"WAVE"])
        idx = raw.find(bytes(target))
        if idx >= 0:
            return _patch(raw, idx, bytes(rng.integers(
                32, 127, size=4, dtype=np.uint8)))
        return raw
    if kind == 10:   # huge junk-chunk size before data (seek past EOF)
        junk = b"LIST" + struct.pack(
            "<I", int(rng.choice([0x7FFFFFFF, 0xFFFFFFF0])))
        return raw[:12] + junk + raw[12:]
    if kind == 11:   # header-only / tiny prefixes
        return raw[:int(rng.choice([0, 4, 12, 20, 36, 44]))]
    # kind == 12 (or a mutation above lacked its target): combined double
    # mutation for deeper states
    out = mutate(raw, rng)
    return mutate(out, rng) if len(out) else out


def make_corpus(n_cases=1000):
    rng = np.random.default_rng(SEED)
    bases = []
    for fmt, bits in [(1, 8), (1, 16), (1, 24), (1, 32), (3, 32), (3, 64)]:
        for channels in (1, 2):
            bases.append(build_wav(rng, fmt=fmt, channels=channels,
                                   bits=bits,
                                   frames=int(rng.integers(1, 400))))
    bases.append(build_wav(rng, fmt=1, bits=16, extensible=True))
    bases.append(build_wav(rng, fmt=3, bits=32, extensible=True))
    bases.append(build_wav(rng, fmt=1, bits=16, junk_before_data=True,
                           trailing_list=False))
    corpus = list(bases)
    while len(corpus) < n_cases:
        base = bases[int(rng.integers(0, len(bases)))]
        corpus.append(mutate(base, rng))
    return corpus


ALLOWED_PY = (ValueError,)


def parse_or_none(raw):
    """Python parse with the fuzz contract: meta or a clean ValueError."""
    try:
        return _parse_wav_header(raw)
    except ALLOWED_PY:
        return None


# --------------------------------------------------------------------------
# python decoder
# --------------------------------------------------------------------------

class TestPythonDecoderFuzz:

    def test_parse_and_decode_bounded(self):
        corpus = make_corpus()
        accepted = 0
        for i, raw in enumerate(corpus):
            try:
                parsed = _parse_wav_header(raw)
            except ALLOWED_PY:
                continue
            except Exception as exc:   # noqa: BLE001 - the assertion
                pytest.fail(f"case {i}: non-ValueError {type(exc).__name__}:"
                            f" {exc}")
            meta, data_offset, data_size = parsed
            accepted += 1
            # invariants a lying header must never break
            assert meta.sample_rate >= 1
            assert meta.num_channels >= 1
            valid = (VALID_FLOAT_BITS if meta.encoding == "float"
                     else VALID_PCM_BITS)
            assert meta.bits_per_sample in valid
            assert 0 <= data_size <= len(raw)
            bpf = meta.num_channels * (meta.bits_per_sample // 8)
            assert meta.num_samples * bpf <= len(raw)
            # full decode must stay within the promised shape
            try:
                wave, rate = _decode_wav_bytes(raw)
            except ALLOWED_PY:
                continue
            except Exception as exc:   # noqa: BLE001
                pytest.fail(f"case {i}: decode raised "
                            f"{type(exc).__name__}: {exc}")
            assert rate == meta.sample_rate
            assert wave.shape[0] == meta.num_channels
            assert wave.shape[1] <= meta.num_samples
            assert wave.dtype == np.float32
        # the corpus must exercise the success path too, not only rejects
        assert accepted >= 50

    def test_audio_call_clean_errors(self, tmp_path):
        """Audio.__call__ on mutated files: decode or ValueError, and the
        result duration is bounded by the file's byte count."""
        corpus = make_corpus(200)
        audio = Audio(sample_rate=16000)
        for i, raw in enumerate(corpus):
            path = tmp_path / f"fuzz_{i}.wav"
            path.write_bytes(raw)
            try:
                wave, rate = audio(str(path))
            except ValueError:
                continue
            except MemoryError:
                pytest.fail(f"case {i}: unbounded allocation")
            assert rate == 16000
            assert np.asarray(wave).ndim == 2
            # 8-bit mono is the densest layout: samples <= bytes, and
            # resampling to 16k can only grow by 16000/min_rate = 16000x
            assert wave.shape[1] <= max(len(raw), 1) * 16000

    def test_metadata_prefix_matches_full_parse(self, tmp_path):
        """get_audio_metadata reads a 64KB prefix + real file size; it must
        agree with the full-byte parse whenever both succeed."""
        corpus = make_corpus(300)
        for i, raw in enumerate(corpus):
            full = parse_or_none(raw)
            path = tmp_path / f"meta_{i}.wav"
            path.write_bytes(raw)
            try:
                meta = get_audio_metadata(str(path))
            except ALLOWED_PY:
                continue
            except Exception as exc:   # noqa: BLE001
                pytest.fail(f"case {i}: metadata raised "
                            f"{type(exc).__name__}: {exc}")
            if full is not None and meta.encoding != "compressed":
                assert meta == full[0], f"case {i}"


# --------------------------------------------------------------------------
# C++ decoder (pat_audio.cc)
# --------------------------------------------------------------------------

@pytest.mark.skipif(not native.available(), reason="libpat_audio.so missing")
class TestNativeDecoderFuzz:

    def test_wav_info_bounded_and_agrees_with_python(self, tmp_path):
        corpus = make_corpus()
        both, accepted = 0, 0
        for i, raw in enumerate(corpus):
            path = tmp_path / f"nat_{i}.wav"
            path.write_bytes(raw)
            info = native.wav_info(str(path))
            if info is None:
                continue
            accepted += 1
            sr, ch, frames = info
            assert sr >= 1 and ch >= 1 and frames >= 0, f"case {i}: {info}"
            # frames * bytes_per_frame <= file bytes; bpf >= ch (8-bit)
            assert frames * ch <= len(raw), f"case {i}: {info}"
            py = parse_or_none(raw)
            if py is not None:
                meta = py[0]
                assert (sr, ch) == (meta.sample_rate, meta.num_channels), \
                    f"case {i}"
                assert frames == meta.num_samples, f"case {i}"
                both += 1
        assert accepted >= 50 and both >= 50

    def test_wav_decode_no_crash(self, tmp_path):
        corpus = make_corpus(400)
        rng = np.random.default_rng(SEED + 1)
        for i, raw in enumerate(corpus):
            path = tmp_path / f"dec_{i}.wav"
            path.write_bytes(raw)
            info = native.wav_info(str(path))
            if info is None:
                assert native.wav_decode(str(path)) is None
                continue
            wave = native.wav_decode(str(path))
            assert wave is not None and wave.dtype == np.float32
            assert wave.shape[0] == info[1]
            # out-of-range slices zero-fill rather than over-read
            tail = native.wav_decode(str(path),
                                     frame_offset=info[2] + 10,
                                     num_frames=int(rng.integers(1, 64)))
            if tail is not None:
                assert not tail.any()

    def test_batch_decode_mixed_corruption(self, tmp_path):
        """A batch mixing valid and corrupt files must survive the C++
        thread pool: either the binding signals failure (None -> caller
        falls back to per-file decode) or every row is sane. An all-valid
        batch must still succeed afterwards (no poisoned state)."""
        rng = np.random.default_rng(SEED + 2)
        good = build_wav(rng, frames=1600)
        paths = []
        corpus = make_corpus(40)
        for i in range(40):
            p = tmp_path / f"b_{i}.wav"
            p.write_bytes(good if i % 3 == 0 else corpus[i])
            paths.append(str(p))
        out = native.batch_decode_resample(paths, 16000, 0.2)
        if out is not None:   # every mutant happened to parse
            waves, lengths = out
            assert waves.shape == (40, 3200)
            assert np.isfinite(waves).all()
            for i, length in enumerate(lengths):
                assert 0 <= length <= 3200
                assert not waves[i, length:].any()
        # clean batch still decodes after the corrupt one
        clean = [str(tmp_path / f"c_{i}.wav") for i in range(8)]
        for p in clean:
            (tmp_path / p.split("/")[-1]).write_bytes(good)
        out = native.batch_decode_resample(clean, 16000, 0.2)
        assert out is not None
        waves, lengths = out
        assert (lengths > 0).all()
        assert np.isfinite(waves).all()


# --------------------------------------------------------------------------
# FFmpeg codec wrapper (pat_codec.cc)
# --------------------------------------------------------------------------

@pytest.mark.skipif(not native.codec_available(),
                    reason="libpat_codec.so unavailable")
class TestCodecFuzz:

    def test_mutated_containers(self, tmp_path):
        """Mutated FLAC/OGG containers: codec_info/codec_decode return sane
        values or None, never crash."""
        rng = np.random.default_rng(SEED + 3)
        wave = (0.1 * rng.standard_normal((1, 8000))).astype(np.float32)
        seeds = {}
        for ext in ("flac", "ogg"):
            p = tmp_path / f"seed.{ext}"
            if native.codec_encode(str(p), wave, 16000):
                seeds[ext] = p.read_bytes()
        if not seeds:
            pytest.skip("codec encode unavailable")
        cases = 0
        for ext, seed in seeds.items():
            for i in range(40):
                buf = bytearray(seed)
                if i % 4 == 0:
                    buf = buf[:int(rng.integers(0, len(buf)))]
                else:
                    for _ in range(int(rng.integers(1, 20))):
                        buf[int(rng.integers(0, max(1, len(buf))))] = \
                            int(rng.integers(0, 256))
                p = tmp_path / f"fz_{i}.{ext}"
                p.write_bytes(bytes(buf))
                info = native.codec_info(str(p))
                if info is not None:
                    sr, ch, frames = info
                    assert sr >= 1 and ch >= 1 and frames >= 0
                decoded = native.codec_decode(str(p))
                if decoded is not None:
                    out, sr = decoded
                    assert out.ndim == 2 and sr >= 1
                    # a mutated 8000-frame seed cannot legitimately
                    # produce orders of magnitude more audio
                    assert out.shape[1] <= 80 * 8000
                cases += 1
        assert cases >= 40
