"""Multi-file benchmark sweep (BASELINE.json config #5).

Synthesizes a mixed-length corpus (DIHARD-like ~5 min files and AMI-like
longer meetings), diarizes every file with known and unknown speaker
counts, and reports throughput per bucket — mirroring the reference's
``benchmark`` CLI speed report (seconds_per_hour).

    python benchmarks/multi_file.py [--ami-minutes 20] [--dihard-files 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def synth_file(minutes: float, seed: int):
    sr = 16000
    rng = np.random.default_rng(seed)
    n = int(minutes * 60 * sr)
    t = np.arange(n) / sr
    wav = 0.003 * rng.standard_normal(n).astype(np.float32)
    f0s = [110.0, 150.0, 210.0, 300.0]
    n_speakers = rng.integers(2, 5)
    pos = 0.5
    while pos < minutes * 60 - 6:
        spk = rng.integers(n_speakers)
        dur = rng.uniform(2.0, 6.0)
        i0, i1 = int(pos * sr), int((pos + dur) * sr)
        tt = t[i0:i1]
        wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0s[spk] * tt)
                       * (0.5 + 0.5 * np.abs(np.sin(2 * np.pi * 3 * tt)))
                       ).astype(np.float32)
        pos += dur + rng.uniform(0.3, 2.0)
    return {"waveform": wav[None], "sample_rate": sr,
            "uri": f"synth{seed}", "n_speakers": int(n_speakers)}


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ami-minutes", type=float, default=20.0)
    parser.add_argument("--ami-files", type=int, default=2)
    parser.add_argument("--dihard-minutes", type=float, default=5.0)
    parser.add_argument("--dihard-files", type=int, default=4)
    args = parser.parse_args()

    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    seg = PyanNet()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["s1", "s2", "s3"], powerset_max_classes=2)
    seg.build()
    emb = WeSpeakerResNet34()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=128, embedding_batch_size=128)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    buckets = {
        "dihard_like": [synth_file(args.dihard_minutes, 10 + i)
                        for i in range(args.dihard_files)],
        "ami_like": [synth_file(args.ami_minutes, 20 + i)
                     for i in range(args.ami_files)],
    }

    # warm up on one file per distinct length bucket
    for files in buckets.values():
        pipeline(dict(files[0]), max_speakers=4)

    report = {}
    for name, files in buckets.items():
        total_audio = total_wall = 0.0
        for i, file in enumerate(files):
            # alternate known / unknown speaker count
            kwargs = {"num_speakers": file["n_speakers"]} if i % 2 else \
                {"max_speakers": 4}
            t0 = time.perf_counter()
            pipeline(dict(file), **kwargs)
            wall = time.perf_counter() - t0
            total_wall += wall
            total_audio += file["waveform"].shape[1] / 16000.0
        report[name] = {
            "files": len(files),
            "audio_minutes": round(total_audio / 60.0, 1),
            "wall_seconds": round(total_wall, 2),
            "seconds_per_audio_hour": round(
                total_wall / (total_audio / 3600.0), 1),
        }

    # batch streaming: path-backed files through pipeline([...]) — the
    # default _apply_batch decodes file N+1 on a worker thread while the
    # device runs file N (the reference never parallelized apply_batch,
    # pipeline.py:489-508)
    import tempfile
    from pyannote_audio_tpu.core.io import write_wav
    tmp = tempfile.mkdtemp(prefix="pat_multifile_")
    batch, total_audio = [], 0.0
    for i, file in enumerate(buckets["dihard_like"]):
        path = Path(tmp) / f"stream{i}.wav"
        write_wav(path, file["waveform"], 16000)
        total_audio += file["waveform"].shape[1] / 16000.0
        batch.append({"audio": str(path), "uri": f"stream{i}"})
    t0 = time.perf_counter()
    outputs = pipeline(batch, max_speakers=4)
    total_wall = time.perf_counter() - t0
    assert len(outputs) == len(batch)
    report["batch_streaming"] = {
        "files": len(batch),
        "audio_minutes": round(total_audio / 60.0, 1),
        "wall_seconds": round(total_wall, 2),
        "seconds_per_audio_hour": round(
            total_wall / (total_audio / 3600.0), 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
