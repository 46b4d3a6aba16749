"""Per-stage wall-clock breakdown of the diarization pipeline on TPU.

Wraps the pipeline's own hook protocol plus explicit boundary timers to
attribute wall time to: decode+upload, segmentation forwards, fused
count/stats, embeddings, clustering, fused reconstruct, annotation.
Forced syncs at stage boundaries shift async dispatch costs into the
stage that issued them, so the *sum* is an upper bound of the unsynced
end-to-end time (also printed).

    python benchmarks/profile_stages.py [--minutes 10] [--runs 3]
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--debug-models", action="store_true")
    args = ap.parse_args()

    from pyannote_audio_tpu.core.io import write_wav
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    sr = 16000
    rng = np.random.default_rng(0)
    n = int(args.minutes * 60 * sr)
    t = np.arange(n) / sr
    wav = 0.003 * rng.standard_normal(n).astype(np.float32)
    for i, start in enumerate(np.arange(0.0, args.minutes * 60 - 5.0, 7.0)):
        f0 = [140.0, 210.0, 320.0][i % 3]
        i0, i1 = int(start * sr), int((start + 5.0) * sr)
        wav[i0:i1] += (0.2 * np.sin(2 * np.pi * f0 * t[i0:i1])
                       ).astype(np.float32)
    wav = (np.round(wav * 32768.0).clip(-32768, 32767)
           / np.float32(32768.0)).astype(np.float32)
    path = "/tmp/pat_profile.wav"
    write_wav(path, wav[None], sr)

    if args.debug_models:
        from pyannote_audio_tpu.models.embedding.debug import \
            SimpleEmbeddingModel
        from pyannote_audio_tpu.models.segmentation.debug import \
            SimpleSegmentationModel
        seg_model = SimpleSegmentationModel()
        duration = 5.0
        emb_model = SimpleEmbeddingModel()
    else:
        from pyannote_audio_tpu.models.embedding.wespeaker import \
            WeSpeakerResNet34
        from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
        seg_model = PyanNet()
        duration = 10.0
        emb_model = WeSpeakerResNet34()
    seg_model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=duration,
        classes=["speaker#1", "speaker#2", "speaker#3"],
        powerset_max_classes=2)
    seg_model.build()
    emb_model.build()

    pipeline = SpeakerDiarization(
        segmentation=seg_model, embedding=emb_model,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=256, embedding_batch_size=256)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    file = {"audio": path, "uri": "profile"}

    # warm up compiles
    pipeline(dict(file), max_speakers=4)

    # unsynced end-to-end
    e2e = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        pipeline(dict(file), max_speakers=4)
        e2e.append(time.perf_counter() - t0)

    # stage attribution via monkeypatched boundaries
    import pyannote_audio_tpu.pipelines.speaker_diarization as sd
    from pyannote_audio_tpu.core.inference import Inference

    stages = {}

    def timed(name, fn):
        def wrapper(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stages[name] = stages.get(name, 0.0) + time.perf_counter() - t0
            return out
        return wrapper

    orig = {
        "segmentation": Inference.__call__,
        "count_stats": sd.SpeakerDiarization._device_count_stats,
        "embeddings": sd.SpeakerDiarization.get_embeddings,
        "clustering_call": None,
        "reconstruct": sd.SpeakerDiarization._device_reconstruct,
    }
    Inference.__call__ = timed("segmentation", orig["segmentation"])
    sd.SpeakerDiarization._device_count_stats = timed(
        "count_stats", orig["count_stats"])
    sd.SpeakerDiarization.get_embeddings = timed(
        "embeddings", orig["embeddings"])
    sd.SpeakerDiarization._device_reconstruct = timed(
        "reconstruct", orig["reconstruct"])
    cluster_cls = type(pipeline.clustering)
    orig_cluster = cluster_cls.__call__
    cluster_cls.__call__ = timed("clustering", orig_cluster)

    try:
        best = {}
        for _ in range(args.runs):
            stages.clear()
            t0 = time.perf_counter()
            pipeline(dict(file), max_speakers=4)
            stages["total"] = time.perf_counter() - t0
            if not best or stages["total"] < best["total"]:
                best = dict(stages)
    finally:
        Inference.__call__ = orig["segmentation"]
        sd.SpeakerDiarization._device_count_stats = orig["count_stats"]
        sd.SpeakerDiarization.get_embeddings = orig["embeddings"]
        sd.SpeakerDiarization._device_reconstruct = orig["reconstruct"]
        cluster_cls.__call__ = orig_cluster

    audio_hours = args.minutes / 60.0
    accounted = sum(v for k, v in best.items() if k != "total")
    best["unattributed"] = best["total"] - accounted
    print(json.dumps({
        "audio_minutes": args.minutes,
        "e2e_seconds_best": round(min(e2e), 3),
        "e2e_seconds_all": [round(x, 3) for x in e2e],
        "seconds_per_audio_hour": round(min(e2e) / audio_hours, 2),
        "stages_seconds": {k: round(v, 3) for k, v in best.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
