"""Fuzz the untrusted ARCHIVE parsers: ONNX protobuf (utils/onnx.py) and
.nemo tar loading (models/embedding/titanet.py) — companions to
tests/test_native_fuzz.py's WAV fuzzing. Both paths accept
externally-supplied files (CLI arguments, snapshot dirs), so malformed
input must fail with a clean python exception in bounded time, never
hang, crash the process, or write outside the archive.
"""

from __future__ import annotations

import io
import signal
import tarfile
import time

import numpy as np
import pytest

from pyannote_audio_tpu.utils.onnx import (read_onnx_initializers,
                                           write_onnx_initializers)

CLEAN = (ValueError, KeyError, IndexError, EOFError, OSError,
         RuntimeError, TypeError, struct_error := __import__(
             "struct").error, tarfile.TarError,
         __import__("yaml").YAMLError, __import__("pickle")
         .UnpicklingError, NotImplementedError, UnicodeDecodeError,
         __import__("zipfile").BadZipFile)


def _mutations(raw: bytes, rng: np.random.Generator, n: int):
    """Classic byte-level mutations: truncation, byte flips, varint
    inflation, duplication, random prefixes."""
    yield b""
    yield raw[: len(raw) // 2]
    yield raw + raw
    for _ in range(n):
        case = bytearray(raw)
        kind = rng.integers(4)
        if kind == 0 and len(case) > 4:                  # flip bytes
            for _ in range(int(rng.integers(1, 8))):
                case[int(rng.integers(len(case)))] = int(
                    rng.integers(256))
        elif kind == 1:                                  # truncate
            case = case[: int(rng.integers(1, len(case) + 1))]
        elif kind == 2 and len(case) > 8:                # inflate a run
            pos = int(rng.integers(len(case) - 4))
            case[pos:pos + 4] = b"\xff\xff\xff\x7f"
        else:                                            # splice
            pos = int(rng.integers(len(case)))
            case = case[:pos] + bytes(rng.integers(
                0, 256, size=16, dtype=np.uint8)) + case[pos:]
        yield bytes(case)


class TestOnnxFuzz:
    def test_mutated_onnx_clean_and_bounded(self, tmp_path):
        rng = np.random.default_rng(0)
        weights = {
            "layer1.0.conv1.weight": rng.standard_normal(
                (4, 3, 3, 3)).astype(np.float32),
            "bn1.running_mean": np.zeros(4, np.float32),
            "fc.weight": np.arange(8, dtype=np.int64).reshape(2, 4),
        }
        seed_path = tmp_path / "seed.onnx"
        write_onnx_initializers(seed_path, weights)
        raw = seed_path.read_bytes()

        # the seed itself parses back exactly
        parsed = read_onnx_initializers(seed_path)
        np.testing.assert_array_equal(
            parsed["layer1.0.conv1.weight"],
            weights["layer1.0.conv1.weight"])

        t0 = time.monotonic()
        outcomes = {"ok": 0, "error": 0}
        for i, case in enumerate(_mutations(raw, rng, 400)):
            path = tmp_path / "case.onnx"
            path.write_bytes(case)
            try:
                out = read_onnx_initializers(path)
                # parsed tensors must be bounded by the input size:
                # every raw_data byte comes from the file itself
                total = sum(v.nbytes for v in out.values())
                assert total <= 4 * len(case) + 1024, (i, total)
                outcomes["ok"] += 1
            except CLEAN:
                outcomes["error"] += 1
        assert outcomes["ok"] + outcomes["error"] >= 400
        assert time.monotonic() - t0 < 60, outcomes


def _nemo_seed(tmp_path):
    import yaml

    config = {"preprocessor": {"features": 8, "sample_rate": 16000},
              "encoder": {"jasper": [
                  {"filters": 8, "repeat": 1, "kernel": [3],
                   "separable": True, "se": True}]},
              "decoder": {"emb_sizes": 8, "attention_channels": 4}}
    import torch

    from pyannote_audio_tpu.models.embedding.titanet import (
        TitaNet, export_nemo_checkpoint)
    model = TitaNet(n_mels=8, blocks=config["encoder"]["jasper"],
                    emb_dim=8, attention_channels=4)
    model.build()
    return export_nemo_checkpoint(model, tmp_path / "seed")


class TestNemoFuzz:
    def test_mutated_nemo_clean_and_bounded(self, tmp_path):
        from pyannote_audio_tpu.models.embedding.titanet import TitaNet

        seed = _nemo_seed(tmp_path)
        raw = seed.read_bytes()
        TitaNet.from_nemo(seed)                     # the seed loads

        rng = np.random.default_rng(1)
        t0 = time.monotonic()
        outcomes = {"ok": 0, "error": 0}
        for i, case in enumerate(_mutations(raw, rng, 120)):
            path = tmp_path / "case.nemo"
            path.write_bytes(case)
            try:
                TitaNet.from_nemo(path)
                outcomes["ok"] += 1
            except CLEAN:
                outcomes["error"] += 1
        assert outcomes["ok"] + outcomes["error"] >= 120
        assert time.monotonic() - t0 < 120, outcomes

    def test_hostile_tar_members(self, tmp_path):
        """Traversal names, missing members, lying sizes, bogus yaml —
        all clean errors, and nothing is ever written to disk (the
        loader reads members in memory only)."""
        import yaml

        from pyannote_audio_tpu.models.embedding.titanet import TitaNet

        def tar_with(members):
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w:gz") as tar:
                for name, payload in members:
                    info = tarfile.TarInfo(name)
                    info.size = len(payload)
                    tar.addfile(info, io.BytesIO(payload))
            return buf.getvalue()

        evil_marker = tmp_path / "evil.txt"
        cases = [
            # no members at all
            tar_with([]),
            # missing weights
            tar_with([("./model_config.yaml", b"preprocessor: {}")]),
            # yaml bomb-ish nesting / invalid yaml
            tar_with([("./model_config.yaml", b"{" * 2000),
                      ("./model_weights.ckpt", b"junk")]),
            # traversal member names must not be followed anywhere
            tar_with([("../evil.txt", b"x"),
                      ("/tmp/abs_evil", b"x"),
                      ("./model_config.yaml", b"a: 1"),
                      ("./model_weights.ckpt", b"junk")]),
            # weights not a torch archive
            tar_with([("./model_config.yaml",
                       yaml.safe_dump({"encoder": {}}).encode()),
                      ("./model_weights.ckpt", b"\x00" * 4096)]),
        ]
        before = set(tmp_path.iterdir())
        for i, raw in enumerate(cases):
            path = tmp_path / "hostile.nemo"
            path.write_bytes(raw)
            with pytest.raises(CLEAN):
                TitaNet.from_nemo(path)
        assert not evil_marker.exists()
        # no stray files appeared next to the archive
        after = set(tmp_path.iterdir()) - {tmp_path / "hostile.nemo"}
        assert after == before - {tmp_path / "hostile.nemo"}
