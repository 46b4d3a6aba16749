"""Interleaved perf A/B: int16 / mu-law / dpcm4 waveform transport on TPU.

Cross-process comparisons on the shared pool/relay are unreliable (the
same code measures 13-57 s/audio-hour depending on the minute), so this
alternates the transport modes within ONE process — A B C A B C ... —
and reports the best pass per mode from the same window.

    python benchmarks/upload_quant_ab.py [--minutes 10] [--reps 4]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--num-files", type=int, default=3)
    args = ap.parse_args()

    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    sr = 16000
    rng = np.random.default_rng(0)
    paths = []
    for k in range(args.num_files):
        n = int(args.minutes * 60 * sr)
        t = np.arange(n) / sr
        wav = 0.003 * rng.standard_normal(n).astype(np.float32)
        for i, start in enumerate(
                np.arange(0.0, args.minutes * 60 - 5.0, 7.0)):
            f0 = [140.0, 210.0, 320.0][(i + k) % 3]
            i0, i1 = int(start * sr), int((start + 5.0) * sr)
            wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0 * t[i0:i1])
                           ).astype(np.float32)
        wav = (np.round(wav * 32768.0).clip(-32768, 32767)
               / np.float32(32768.0)).astype(np.float32)
        path = f"/tmp/pat_quant_ab_{k}.wav"
        write_wav(path, wav[None], sr)
        paths.append(path)

    seg_model = PyanNet()
    seg_model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2)
    seg_model.build()
    emb_model = WeSpeakerResNet34()
    emb_model.build()
    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256, embedding_batch_size=256)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    def batch():
        return [{"audio": p, "uri": f"q{k}"} for k, p in enumerate(paths)]

    modes = ["int16", "mulaw", "dpcm4"]
    # compile both transports before timing
    for mode in modes:
        os.environ["PYANNOTE_TPU_UPLOAD_QUANT"] = mode
        pipeline(batch(), max_speakers=4)

    results = {m: [] for m in modes}
    for _ in range(args.reps):
        for mode in modes:
            os.environ["PYANNOTE_TPU_UPLOAD_QUANT"] = mode
            t0 = time.perf_counter()
            pipeline(batch(), max_speakers=4)
            results[mode].append(time.perf_counter() - t0)
    os.environ.pop("PYANNOTE_TPU_UPLOAD_QUANT", None)

    audio_hours = args.num_files * args.minutes / 60.0
    print(json.dumps({
        "audio_minutes": args.minutes,
        "num_files": args.num_files,
        "s_per_audio_hour": {
            m: round(min(v) / audio_hours, 2) for m, v in results.items()},
        "all_passes_s": {m: [round(x, 3) for x in v]
                         for m, v in results.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
