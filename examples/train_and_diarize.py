"""End-to-end capability proof: train, diarize, evaluate.

Trains PyanNet (small config) on a synthetic multi-speaker corpus, builds
a diarization pipeline from the trained model + a WeSpeaker embedder, and
reports DER against the known ground truth. Runs on TPU or CPU.

    python examples/train_and_diarize.py [--epochs 8] [--files 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=8)
    parser.add_argument("--files", type=int, default=12)
    parser.add_argument("--duration", type=float, default=5.0)
    args = parser.parse_args()

    from corpus import make_file
    from pyannote_audio_tpu.metrics.der import DiarizationErrorRate
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.pipelines.speaker_diarization import \
        SpeakerDiarization
    from pyannote_audio_tpu.tasks.segmentation import \
        SpeakerDiarization as SpeakerDiarizationTask
    from pyannote_audio_tpu.train import Trainer
    from pyannote_audio_tpu.utils.database import Protocol

    root = Path(tempfile.mkdtemp(prefix="pat_train_"))
    rng = np.random.default_rng(0)
    speakers = ["alice", "bob", "carol", "dave"]

    def random_turns(duration, n_speakers=2):
        chosen = rng.choice(speakers, n_speakers, replace=False)
        turns, t = [], 0.5
        while t < duration - 3.0:
            spk = chosen[rng.integers(n_speakers)]
            length = rng.uniform(1.5, 4.0)
            turns.append((spk, t, min(t + length, duration - 0.2)))
            t += length + rng.uniform(0.2, 1.2)
        return turns

    train_files, dev_files = [], []
    for i in range(args.files):
        f = make_file(root / f"trn{i:02d}.wav",
                      random_turns(30.0), 30.0, seed=i)
        train_files.append(f)
    for i in range(2):
        f = make_file(root / f"dev{i:02d}.wav",
                      random_turns(30.0), 30.0, seed=100 + i)
        dev_files.append(f)
    protocol = Protocol(name="Synthetic",
                        subsets={"train": train_files,
                                 "development": dev_files})

    task = SpeakerDiarizationTask(protocol, duration=args.duration,
                                  batch_size=32,
                                  max_speakers_per_chunk=3)
    model = PyanNet(lstm={"hidden_size": 64, "num_layers": 2},
                    linear={"hidden_size": 64, "num_layers": 2},
                    task=task)
    trainer = Trainer(max_epochs=args.epochs, learning_rate=1e-3)
    t0 = time.time()
    trainer.fit(model, task)
    print(f"training: {time.time() - t0:.0f}s")
    for row in trainer.history:
        print("  ", {k: round(v, 3) for k, v in row.items()})

    emb = SimpleEmbeddingModel()
    emb.build()
    pipeline = SpeakerDiarization(
        segmentation=model, embedding=emb,
        clustering="AgglomerativeClustering",
        segmentation_batch_size=32, embedding_batch_size=32)
    pipeline.instantiate({
        "segmentation": {"min_duration_off": 0.1},
        "clustering": {"method": "centroid", "threshold": 0.5,
                       "min_cluster_size": 1}})

    metric = DiarizationErrorRate()
    for file in dev_files:
        output = pipeline(dict(file), max_speakers=3)
        der = metric(file["annotation"], output.speaker_diarization,
                     uem=file.get("annotated"))
        print(f"  {file['uri']}: DER={der:.1%}")
    print(f"overall DER: {abs(metric):.1%}")
    return abs(metric)


if __name__ == "__main__":
    main()
