"""Synthetic deterministic test corpus: multi-speaker WAVs + annotations.

Each "speaker" is a distinct harmonic series + band noise so that embedding
models can separate them. Mirrors the role of the reference's tests/data
mini-corpus (SURVEY.md §4) without copying any audio assets.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Tuple

import numpy as np

from pyannote_audio_tpu import Annotation, Segment, Timeline
from pyannote_audio_tpu.core.io import write_wav

SAMPLE_RATE = 16000

# per-speaker fundamental frequencies (Hz)
_F0 = {"alice": 140.0, "bob": 210.0, "carol": 320.0, "dave": 95.0}


def speaker_signal(name: str, t: np.ndarray, rng: np.random.Generator
                   ) -> np.ndarray:
    f0 = _F0[name]
    sig = np.zeros_like(t)
    for h in range(1, 6):
        sig += (1.0 / h) * np.sin(2 * np.pi * f0 * h * t
                                  + rng.uniform(0, 2 * np.pi))
    # amplitude modulation (syllable-ish) + small noise
    sig *= 0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 3.0 * t))
    sig += 0.02 * rng.standard_normal(len(t))
    return 0.2 * sig


def make_file(
    path: Path,
    turns: List[Tuple[str, float, float]],
    duration: float,
    seed: int = 0,
) -> Dict:
    """Render turns [(speaker, start, end)] into a WAV + Annotation."""
    rng = np.random.default_rng(seed)
    n = int(duration * SAMPLE_RATE)
    wav = 0.003 * rng.standard_normal(n)
    ann = Annotation(uri=path.stem)
    for speaker, start, end in turns:
        i0, i1 = int(start * SAMPLE_RATE), int(end * SAMPLE_RATE)
        t = np.arange(i1 - i0) / SAMPLE_RATE
        wav[i0:i1] += speaker_signal(speaker, t, rng)
        seg = Segment(start, end)
        ann[seg, ann.new_track(seg)] = speaker
    write_wav(path, wav[None].astype(np.float32), SAMPLE_RATE)
    return {
        "uri": path.stem,
        "audio": str(path),
        "annotation": ann,
        "annotated": Timeline([Segment(0, duration)], uri=path.stem),
    }


def default_two_speaker_file(path: Path, duration: float = 30.0) -> Dict:
    turns = [
        ("alice", 1.0, 5.0),
        ("bob", 6.0, 10.0),
        ("alice", 11.0, 14.0),
        ("bob", 14.5, 18.0),
        ("alice", 19.0, 24.0),
        ("bob", 25.0, 29.0),
    ]
    return make_file(path, turns, duration)


def build_debug_corpus(root) -> str:
    """Materialize corpus + RTTM/UEM + database.yml + a debug pipeline
    checkpoint under ``root``; returns the protocol name.

    This is the dry-run entry point of the real-checkpoint parity
    harness (docs/REAL_CHECKPOINT_PARITY.md §0): after this,
    ``python -m pyannote_audio_tpu benchmark {root}/pipeline
    Debug.SpeakerDiarization.Debug out --registry {root}/database.yml``
    runs end to end.
    """
    import yaml

    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    files = [default_two_speaker_file(root / "f0.wav"),
             make_file(root / "f1.wav",
                       [("carol", 1.0, 6.0), ("dave", 7.0, 12.0)],
                       duration=14.0, seed=3)]
    with open(root / "all.rttm", "w") as f:
        for file in files:
            file["annotation"].write_rttm(f)
    with open(root / "all.uem", "w") as f:
        for file in files:
            for seg in file["annotated"]:
                f.write(f"{file['uri']} 1 {seg.start:.3f} "
                        f"{seg.end:.3f}\n")
    (root / "database.yml").write_text(f"""
Databases:
  Debug: {root}/{{uri}}.wav
Protocols:
  Debug:
    SpeakerDiarization:
      Debug:
        test:
          annotation: {root}/all.rttm
          annotated: {root}/all.uem
        development:
          annotation: {root}/all.rttm
          annotated: {root}/all.uem
""")

    ckpt = root / "pipeline"
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    seg.save_checkpoint(ckpt / "segmentation")
    emb = SimpleEmbeddingModel()
    emb.build()
    emb.save_checkpoint(ckpt / "embedding")
    config = {
        "pipeline": {
            "name": "pyannote_audio_tpu.pipelines.SpeakerDiarization",
            "params": {
                "segmentation": "$model/segmentation",
                "embedding": "$model/embedding",
                "clustering": "AgglomerativeClustering",
                "segmentation_batch_size": 8,
                "embedding_batch_size": 8,
            },
        },
        "params": {
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1},
        },
    }
    with open(ckpt / "config.yaml", "w") as f:
        yaml.safe_dump(config, f)
    return "Debug.SpeakerDiarization.Debug"
