"""Tutorial 6 as a runnable script: TPE hyperparameter tuning with a
resumable journal.

Builds a debug pipeline checkpoint + synthetic corpus, runs the CLI
`optimize` command for a few trials, then re-runs it to show the journal
resuming (trial count continues instead of restarting).

Parity: the reference's pyannote-audio-optimize workflow / tutorial.

    python examples/optimize_pipeline.py [--trials 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import yaml

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=4)
    args = parser.parse_args()

    from corpus import default_two_speaker_file, make_file
    from pyannote_audio_tpu.__main__ import main as cli
    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.debug import \
        SimpleSegmentationModel

    root = Path(tempfile.mkdtemp(prefix="pat_optimize_"))

    # pipeline checkpoint (debug models keep the example fast)
    ckpt = root / "ckpt"
    seg = SimpleSegmentationModel()
    seg.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=5.0,
        classes=["s0", "s1", "s2"], powerset_max_classes=2)
    seg.build()
    seg.save_checkpoint(ckpt / "segmentation")
    emb = SimpleEmbeddingModel()
    emb.build()
    emb.save_checkpoint(ckpt / "embedding")
    (ckpt / "config.yaml").write_text(yaml.safe_dump({
        "pipeline": {
            "name": "pyannote_audio_tpu.pipelines.SpeakerDiarization",
            "params": {"segmentation": "$model/segmentation",
                       "embedding": "$model/embedding",
                       "clustering": "AgglomerativeClustering",
                       "segmentation_batch_size": 8,
                       "embedding_batch_size": 8}},
        "params": {"segmentation": {"min_duration_off": 0.0},
                   "clustering": {"method": "centroid", "threshold": 0.6,
                                  "min_cluster_size": 1}},
    }))

    # 2-file corpus with RTTM/UEM ground truth + registry
    files = [default_two_speaker_file(root / "f0.wav"),
             make_file(root / "f1.wav",
                       [("carol", 1.0, 6.0), ("dave", 7.0, 12.0)],
                       duration=14.0, seed=3)]
    with open(root / "all.rttm", "w") as f:
        for file in files:
            file["annotation"].write_rttm(f)
    with open(root / "all.uem", "w") as f:
        for file in files:
            for seg_ in file["annotated"]:
                f.write(f"{file['uri']} 1 {seg_.start:.3f} "
                        f"{seg_.end:.3f}\n")
    (root / "database.yml").write_text(f"""
Databases:
  OptDB: {root}/{{uri}}.wav
Protocols:
  OptDB:
    SpeakerDiarization:
      P:
        development:
          annotation: {root}/all.rttm
          annotated: {root}/all.uem
""")

    tuning = root / "tuning"
    cmd = ["optimize", str(ckpt), "OptDB.SpeakerDiarization.P",
           str(tuning), "--registry", str(root / "database.yml"),
           "--subset", "development", "--trials", str(args.trials)]
    assert cli(list(cmd)) == 0
    journal = (tuning / "journal.jsonl").read_text().strip().splitlines()
    print(f"after run 1: {len(journal)} journal entries")

    # resume: the journal keeps growing, the TPE density models warm-start
    assert cli(list(cmd)) == 0
    journal2 = (tuning / "journal.jsonl").read_text().strip().splitlines()
    print(f"after run 2: {len(journal2)} journal entries (resumed)")
    assert len(journal2) > len(journal)

    print("optimize + journal resume OK")


if __name__ == "__main__":
    main()
