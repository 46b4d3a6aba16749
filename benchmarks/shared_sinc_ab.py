"""DER + wall A/B: per-chunk vs shared whole-file sinc conv front-end.

PYANNOTE_TPU_SHARED_SINC computes PyanNet's first conv once per file
(SincNet.from_conv affine fold) instead of re-convolving every
90%-overlapping chunk. The fold is mathematically exact; this A/B pins
the float-reassociation effect at the DER level with the real PyanNet
architecture, and times both modes in one pool window. Other gates stay
at their backend defaults (bf16 convs on TPU), so the comparison is
exactly default-vs-opted-out.

    python benchmarks/shared_sinc_ab.py          # TPU
    env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python benchmarks/shared_sinc_ab.py      # CPU check
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
sys.path.insert(0, str(Path(__file__).parent.parent / "benchmarks"))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))

from clustering_ab import build_corpus  # noqa: E402


def run(files, shared: bool):
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.metrics.der import DiarizationErrorRate
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization

    os.environ["PYANNOTE_TPU_SHARED_SINC"] = "1" if shared else "0"

    seg = PyanNet()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
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
    root = Path(tempfile.mkdtemp(prefix="pat_sharedsinc_ab_"))
    files = build_corpus(root)
    off_der, off_wall = run(files, shared=False)
    on_der, on_wall = run(files, shared=True)
    os.environ.pop("PYANNOTE_TPU_SHARED_SINC", None)
    print(json.dumps({
        "per_chunk_der": round(off_der, 4),
        "shared_der": round(on_der, 4),
        "der_delta": round(on_der - off_der, 4),
        "per_chunk_wall_s": round(off_wall, 2),
        "shared_wall_s": round(on_wall, 2),
    }, indent=2))


if __name__ == "__main__":
    main()
