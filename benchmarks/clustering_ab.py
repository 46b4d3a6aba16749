"""DER A/B: host scipy clustering vs on-device clustering backends.

Runs the diarization pipeline over a synthetic multi-speaker corpus with
the exact host backends (scipy linkage / sklearn KMeans) and with the
on-device implementations (PYANNOTE_TPU_DEVICE_AHC / _KMEANS), reports
per-backend DER and wall time, and their deltas. Used to decide the
device-clustering defaults (round-2 item; results recorded in
docs/PARITY.md).

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/clustering_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def build_corpus(root: Path):
    from corpus import make_file
    turn_sets = [
        [("alice", 0.5, 6.0), ("bob", 7.0, 13.0), ("alice", 14.0, 19.0)],
        [("carol", 1.0, 8.0), ("dave", 8.5, 15.0), ("carol", 15.5, 19.5),
         ("dave", 20.0, 24.0)],
        [("alice", 0.5, 5.0), ("carol", 5.0, 11.0), ("bob", 11.5, 17.0)],
        [("bob", 1.0, 9.0), ("dave", 10.0, 18.0)],
    ]
    return [make_file(root / f"ab{i:02d}.wav", turns,
                      duration=max(end for _, _, end in turns) + 1.0,
                      seed=i)
            for i, turns in enumerate(turn_sets)]


def run(files, clustering: str, device: bool):
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.metrics.der import DiarizationErrorRate
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    for var in ("PYANNOTE_TPU_DEVICE_AHC", "PYANNOTE_TPU_DEVICE_KMEANS",
                "PYANNOTE_TPU_DEVICE_VBX"):
        os.environ[var] = "1" if device else "0"

    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    seg.build()
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb, clustering=clustering,
        segmentation_batch_size=32, embedding_batch_size=32)
    if clustering == "AgglomerativeClustering":
        pipeline.instantiate({
            "segmentation": {"min_duration_off": 0.0},
            "clustering": {"method": "centroid", "threshold": 0.6,
                           "min_cluster_size": 1}})
    else:
        pipeline.instantiate({"segmentation": {"min_duration_off": 0.0}})

    metric = DiarizationErrorRate()
    kwargs_list = []
    for file in files:
        kwargs = {}
        if clustering == "KMeansClustering":
            kwargs["num_speakers"] = len(file["annotation"].labels())
        else:
            kwargs["max_speakers"] = 4
        kwargs_list.append(kwargs)
    # warm up compiles on the first file, then time the sweep
    pipeline(dict(files[0]), **kwargs_list[0])
    t0 = time.perf_counter()
    for file, kwargs in zip(files, kwargs_list):
        out = pipeline(dict(file), **kwargs)
        metric(file["annotation"], out.speaker_diarization,
               uem=file.get("annotated"))
    wall = time.perf_counter() - t0
    return abs(metric), wall


def main():
    import tempfile
    root = Path(tempfile.mkdtemp(prefix="pat_cluster_ab_"))
    files = build_corpus(root)
    report = {}
    for clustering in ("AgglomerativeClustering", "KMeansClustering"):
        host_der, host_wall = run(files, clustering, device=False)
        dev_der, dev_wall = run(files, clustering, device=True)
        report[clustering] = {
            "host_der": round(host_der, 4),
            "device_der": round(dev_der, 4),
            "der_delta": round(dev_der - host_der, 4),
            "host_wall_s": round(host_wall, 2),
            "device_wall_s": round(dev_wall, 2),
        }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
