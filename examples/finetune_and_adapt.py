"""Tutorial 15 as a runnable script: adapt a pretrained pipeline.

1. "Pretrain" a small PyanNet on a synthetic corpus and save the
   pipeline checkpoint directory (stands in for a downloaded one).
2. Fine-tune the segmentation model on a NEW corpus
   (Model.from_pretrained -> Trainer.fit).
3. Swap the fine-tuned model into a copy of the pipeline checkpoint
   ($model/segmentation indirection) and apply it.

Parity: tutorials/adapting_pretrained_pipeline.ipynb (reference repo).

    python examples/finetune_and_adapt.py [--epochs 2] [--files 6]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np
import yaml

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def synthetic_protocol(root: Path, n_files: int, seed0: int):
    from corpus import make_file
    from pyannote_audio_tpu.utils.database import Protocol

    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed0)
    speakers = ["alice", "bob", "carol", "dave"]

    def turns(duration):
        chosen = rng.choice(speakers, 2, replace=False)
        out, t = [], 0.5
        while t < duration - 3.0:
            length = rng.uniform(1.5, 4.0)
            out.append((chosen[rng.integers(2)], t,
                        min(t + length, duration - 0.2)))
            t += length + rng.uniform(0.2, 1.2)
        return out

    files = [make_file(root / f"f{seed0}_{i:02d}.wav", turns(30.0), 30.0,
                       seed=seed0 + i) for i in range(n_files)]
    return Protocol(name=f"Synth{seed0}",
                    subsets={"train": files[:-1],
                             "development": files[-1:]}), files


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--files", type=int, default=6)
    args = parser.parse_args()

    from pyannote_audio_tpu.core.model import Model
    from pyannote_audio_tpu.core.pipeline import Pipeline
    from pyannote_audio_tpu.models.embedding.debug import \
        SimpleEmbeddingModel
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.tasks.segmentation import \
        SpeakerDiarization as SpeakerDiarizationTask
    from pyannote_audio_tpu.train import Trainer

    root = Path(tempfile.mkdtemp(prefix="pat_adapt_"))

    # -- 1. pretrain + save the pipeline checkpoint dir -------------------
    pre_protocol, _ = synthetic_protocol(root / "pre", args.files, 0)
    task = SpeakerDiarizationTask(pre_protocol, duration=5.0,
                                  batch_size=32, max_speakers_per_chunk=3)
    model = PyanNet(lstm={"hidden_size": 64, "num_layers": 2},
                    linear={"hidden_size": 64, "num_layers": 1},
                    task=task)
    Trainer(max_epochs=1, learning_rate=1e-3).fit(model, task)
    ckpt = root / "pipeline-ckpt"
    model.save_checkpoint(ckpt / "segmentation")
    emb = SimpleEmbeddingModel()
    emb.build()
    emb.save_checkpoint(ckpt / "embedding")
    (ckpt / "config.yaml").write_text(yaml.safe_dump({
        "pipeline": {
            "name": "pyannote_audio_tpu.pipelines.SpeakerDiarization",
            "params": {"segmentation": "$model/segmentation",
                       "embedding": "$model/embedding",
                       "clustering": "AgglomerativeClustering",
                       "segmentation_batch_size": 32,
                       "embedding_batch_size": 32}},
        "params": {"segmentation": {"min_duration_off": 0.1},
                   "clustering": {"method": "centroid", "threshold": 0.5,
                                  "min_cluster_size": 1}},
    }))
    print(f"pretrained pipeline checkpoint: {ckpt}")

    # -- 2. fine-tune the segmentation model on the target corpus ---------
    ft_protocol, ft_files = synthetic_protocol(root / "tgt",
                                               args.files, 100)
    finetuned = Model.from_pretrained(ckpt / "segmentation")
    ft_task = SpeakerDiarizationTask(ft_protocol, duration=5.0,
                                     batch_size=32,
                                     max_speakers_per_chunk=3)
    finetuned.task = ft_task
    trainer = Trainer(max_epochs=args.epochs, learning_rate=5e-4)
    trainer.fit(finetuned, ft_task)
    last = trainer.history[-1] if trainer.history else {}
    print(f"fine-tuned {args.epochs} epochs; "
          f"last loss {last.get('loss', float('nan')):.3f}")

    # -- 3. swap into an adapted pipeline checkpoint and apply ------------
    adapted = root / "pipeline-adapted"
    shutil.copytree(ckpt, adapted)
    shutil.rmtree(adapted / "segmentation")
    finetuned.save_checkpoint(adapted / "segmentation")
    pipeline = Pipeline.from_pretrained(adapted)
    output = pipeline(dict(ft_files[-1]), max_speakers=3)
    diarization = getattr(output, "speaker_diarization", output)
    print(f"adapted pipeline speakers: {sorted(diarization.labels())}")
    print("adapted pipeline applied OK")


if __name__ == "__main__":
    main()
