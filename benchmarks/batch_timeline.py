"""Wall-clock timeline of the pipelined apply_batch on TPU.

Wraps _stage/_finalize with timestamps over a 3-file batch and prints
each call's start/duration relative to batch start. Shows whether the
host half truly overlaps device compute, and how long each file's
stage (host-side dispatch work: decode, encode, pad, checksum, enqueue)
takes versus its finalize (sync + clustering + annotation).

    python benchmarks/batch_timeline.py [--minutes 10] [--reps 3]
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
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--num-files", type=int, default=3)
    args = ap.parse_args()

    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.wespeaker import \
        WeSpeakerResNet34
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    import pyannote_audio_tpu.pipelines.speaker_diarization as sd

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
        path = f"/tmp/pat_timeline_{k}.wav"
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
    pipeline = sd.SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256, embedding_batch_size=256)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    def batch():
        return [{"audio": p, "uri": f"t{k}"}
                for k, p in enumerate(paths)]

    pipeline(batch(), max_speakers=4)  # compile + warm

    events = []
    t0_ref = [0.0]
    orig_stage = sd.SpeakerDiarization._stage
    orig_final = sd.SpeakerDiarization._finalize

    def timed(name, fn):
        def wrapper(self, *a, **k):
            t0 = time.perf_counter()
            out = fn(self, *a, **k)
            events.append((name, t0 - t0_ref[0],
                           time.perf_counter() - t0))
            return out
        return wrapper

    sd.SpeakerDiarization._stage = timed("stage", orig_stage)
    sd.SpeakerDiarization._finalize = timed("finalize", orig_final)
    try:
        best = None
        for _ in range(args.reps):
            events.clear()
            t0_ref[0] = time.perf_counter()
            pipeline(batch(), max_speakers=4)
            total = time.perf_counter() - t0_ref[0]
            if best is None or total < best[0]:
                best = (total, list(events))
    finally:
        sd.SpeakerDiarization._stage = orig_stage
        sd.SpeakerDiarization._finalize = orig_final

    total, ev = best
    print(json.dumps({
        "num_files": args.num_files,
        "total_s": round(total, 3),
        "s_per_audio_hour": round(
            total / (args.num_files * args.minutes / 60.0), 2),
        "timeline": [
            {"what": w, "start_s": round(s, 3), "dur_s": round(d, 3)}
            for w, s, d in ev],
    }, indent=2))


if __name__ == "__main__":
    main()
