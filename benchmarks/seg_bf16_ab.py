"""DER A/B: f32 vs bf16 SincNet convolutions (PYANNOTE_TPU_SEG_BF16).

Same synthetic corpus as clustering_ab.py but with the real PyanNet
segmentation architecture (the gate lives in SincNet, which the debug
model doesn't use). Untrained random weights exaggerate decision
sensitivity, so the delta is an upper bound on what trained models see.
Results recorded in docs/PARITY.md.

    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/seg_bf16_ab.py
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from clustering_ab import build_corpus  # noqa: E402


def run(files, bf16: bool):
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.metrics.der import DiarizationErrorRate
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    os.environ["PYANNOTE_TPU_SEG_BF16"] = "1" if bf16 else "0"

    seg = PyanNet()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    seg.build()
    # identical weights across modes: params are seeded by flax's default
    # deterministic init (same seed both runs), so both modes score the
    # exact same network
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

    metric = DiarizationErrorRate()
    pipeline(dict(files[0]), max_speakers=4)  # compile
    t0 = time.perf_counter()
    for file in files:
        out = pipeline(dict(file), max_speakers=4)
        metric(file["annotation"], out.speaker_diarization,
               uem=file.get("annotated"))
    return abs(metric), time.perf_counter() - t0


def main():
    import tempfile
    root = Path(tempfile.mkdtemp(prefix="pat_segbf16_ab_"))
    files = build_corpus(root)
    f32_der, f32_wall = run(files, bf16=False)
    bf16_der, bf16_wall = run(files, bf16=True)
    os.environ.pop("PYANNOTE_TPU_SEG_BF16", None)
    print(json.dumps({
        "f32_der": round(f32_der, 4),
        "bf16_der": round(bf16_der, 4),
        "der_delta": round(bf16_der - f32_der, 4),
        "f32_wall_s": round(f32_wall, 2),
        "bf16_wall_s": round(bf16_wall, 2),
    }, indent=2))


if __name__ == "__main__":
    main()
