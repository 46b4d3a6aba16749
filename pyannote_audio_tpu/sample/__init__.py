"""Bundled sample file for demos and tests.

Parity role: /root/reference/src/pyannote/audio/sample/ (sample.wav + RTTM
ground truth exposed as SAMPLE_FILE). No audio asset is shipped; a
deterministic two-speaker conversation is synthesized on first access and
cached next to this module (keeps the wheel binary-free and avoids
copying the reference's audio).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..core.annotation import Annotation, Timeline
from ..core.segment import Segment

_DIR = Path(__file__).parent
_WAV = _DIR / "sample.wav"
_TURNS = [
    ("speaker_A", 1.0, 4.5),
    ("speaker_B", 5.0, 8.5),
    ("speaker_A", 9.5, 13.0),
    ("speaker_B", 13.5, 17.5),
    ("speaker_A", 18.5, 22.0),
    ("speaker_B", 23.0, 27.5),
]
_DURATION = 29.0
_SAMPLE_RATE = 16000


def _synthesize() -> None:
    from ..core.io import write_wav
    rng = np.random.default_rng(1234)
    n = int(_DURATION * _SAMPLE_RATE)
    wav = 0.003 * rng.standard_normal(n).astype(np.float32)
    f0 = {"speaker_A": 130.0, "speaker_B": 235.0}
    for speaker, start, end in _TURNS:
        i0, i1 = int(start * _SAMPLE_RATE), int(end * _SAMPLE_RATE)
        t = np.arange(i1 - i0) / _SAMPLE_RATE
        sig = np.zeros_like(t)
        for h in range(1, 6):
            sig += (1.0 / h) * np.sin(
                2 * np.pi * f0[speaker] * h * t
                + rng.uniform(0, 2 * np.pi))
        sig *= 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 3.0 * t))
        wav[i0:i1] += (0.2 * sig).astype(np.float32)
    write_wav(_WAV, wav[None], _SAMPLE_RATE)


def _annotation() -> Annotation:
    ann = Annotation(uri="sample")
    for speaker, start, end in _TURNS:
        seg = Segment(start, end)
        ann[seg, ann.new_track(seg)] = speaker
    return ann


def _build_sample_file() -> dict:
    if not _WAV.exists():
        _synthesize()
    return {
        "uri": "sample",
        "audio": str(_WAV),
        "annotation": _annotation(),
        "annotated": Timeline([Segment(0.0, _DURATION)], uri="sample"),
    }


def load_stm(file_stm) -> dict:
    """Parse an STM transcription file into per-session word entries.

    Parity: load_stm (reference sample/__init__.py:32-49): returns
    {session_id: [{"start", "end", "text", "speaker"}, ...]}.
    """
    session_ids: dict = {}
    with open(file_stm, "r") as stm:
        for line in stm:
            infos = line.strip().split()
            if not infos:
                continue
            session_id, _, speaker, start, end, *words = infos
            session_ids.setdefault(session_id, []).append({
                "start": float(start),
                "end": float(end),
                "text": " ".join(words),
                "speaker": speaker,
            })
    return session_ids


SAMPLE_FILE = _build_sample_file()

__all__ = ["SAMPLE_FILE", "load_stm"]
