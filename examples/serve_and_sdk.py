"""Tutorials 18/serve as a runnable script: self-hosted REST serving
driven by the shipped SDK client.

Starts DiarizationServer (the pyannoteAI-shaped REST API) on a local
port with a debug pipeline, warms the pipeline before traffic, then uses
the SDK client end to end: presigned upload -> job submit -> poll ->
DiarizeOutput.

Parity: the reference's pyannoteAI cloud workflow, self-hosted
(serve.py + pipelines/pyannoteai/).

    python examples/serve_and_sdk.py
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    from corpus import default_two_speaker_file
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel
    from pyannote_audio_tpu.pipelines.pyannoteai.client import Client
    from pyannote_audio_tpu.pipelines.pyannoteai.sdk import SDK
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    from pyannote_audio_tpu.serve import DiarizationServer

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
        segmentation_batch_size=8, embedding_batch_size=8)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.0},
        "clustering": {"method": "centroid", "threshold": 0.6,
                       "min_cluster_size": 1}})

    # precompile every executable for the expected file-length bucket
    # BEFORE traffic (tutorial 18)
    pipeline.warmup(duration=15.0, max_speakers=3)
    print("warmup done (executables compiled)")

    root = Path(tempfile.mkdtemp(prefix="pat_serve_"))
    file = default_two_speaker_file(root / "meeting.wav")

    with DiarizationServer(pipeline, token="demo-token") as server:
        print(f"serving at {server.api_url}")
        sdk = SDK(token="demo-token")
        sdk._client = Client("demo-token", base_url=server.api_url,
                             poll_interval=0.1, timeout=300.0)
        output = sdk.apply(str(file["audio"]), max_speakers=3)

    diarization = output.speaker_diarization
    print(f"speakers: {sorted(diarization.labels())}")
    for segment, _, label in list(diarization.itertracks(
            yield_label=True))[:5]:
        print(f"  {segment.start:6.2f} - {segment.end:6.2f}  {label}")
    print("SDK round trip OK")


if __name__ == "__main__":
    main()
