"""Production-shaped serving: streaming multi-file batch diarization.

Demonstrates the pieces a serving deployment uses:
  * one warmup pass so every executable is compiled before traffic
  * the streaming ``pipeline([file, ...])`` batch path — file N+1 is
    decoded (and its upload staged) while the device works on file N
  * TimingHook per-file stage timings

Run (CPU):
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/serve_streaming_batch.py
Run (TPU): python examples/serve_streaming_batch.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main() -> int:
    from corpus import default_two_speaker_file, make_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    from pyannote_audio_tpu.pipelines.utils.hook import TimingHook

    # in production these come from Pipeline.from_pretrained(ckpt_dir);
    # debug models keep this example CPU-fast
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=seg, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=32, embedding_batch_size=32)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    root = Path(tempfile.mkdtemp())
    files = [dict(default_two_speaker_file(root / "a.wav"), uri="a"),
             dict(make_file(root / "b.wav",
                            [("carol", 1.0, 8.0), ("dave", 9.0, 14.0)],
                            duration=16.0, seed=3), uri="b"),
             dict(make_file(root / "c.wav",
                            [("alice", 0.5, 5.0), ("carol", 6.0, 11.0)],
                            duration=12.0, seed=4), uri="c")]

    # warmup compiles every executable before traffic
    t0 = time.perf_counter()
    pipeline(dict(files[0]), max_speakers=3)
    print(f"warmup (compiles): {time.perf_counter() - t0:.2f}s")

    # streaming batch: decode/upload of file N+1 overlaps compute of N
    batch = [dict(f) for f in files]
    for f in batch:
        f["__timing__"] = {}
    t0 = time.perf_counter()
    outputs = pipeline(batch, max_speakers=3, hook=TimingHook())
    wall = time.perf_counter() - t0
    total_audio = sum(f["annotated"].extent().end for f in files)
    print(f"batch of {len(files)}: {wall:.2f}s wall for "
          f"{total_audio:.0f}s audio "
          f"({wall / (total_audio / 3600.0):.1f} s per audio-hour)")
    for f, out in zip(batch, outputs):
        timing = f.get("timing", {})
        stages = ", ".join(f"{k}={v:.3f}s" for k, v in timing.items())
        speakers = out.speaker_diarization.labels()
        print(f"  {f['uri']}: {len(speakers)} speakers [{stages}]")
    return 0


if __name__ == "__main__":
    sys.exit(main())
