"""Speaker-verification EER benchmark (BASELINE.json config #3).

Builds synthetic verification trials (same-/different-speaker pairs of
harmonic voices), extracts embeddings with the WeSpeaker ResNet34 (or the
fast debug embedder), and reports EER + extraction throughput.

    python benchmarks/verification_eer.py [--trials 100] [--debug-model]
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
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=100)
    parser.add_argument("--seconds", type=float, default=3.0)
    parser.add_argument("--debug-model", action="store_true")
    args = parser.parse_args()

    from corpus import speaker_signal
    from pyannote_audio_tpu.metrics.streaming import EqualErrorRate

    if args.debug_model:
        from pyannote_audio_tpu.models.embedding.debug import \
            SimpleEmbeddingModel
        model = SimpleEmbeddingModel()
    else:
        from pyannote_audio_tpu.models.embedding.wespeaker import \
            WeSpeakerResNet34
        model = WeSpeakerResNet34()
    model.build()

    sr = 16000
    speakers = ["alice", "bob", "carol", "dave"]
    rng = np.random.default_rng(0)
    n = int(args.seconds * sr)
    t = np.arange(n) / sr

    def utterance(speaker):
        return (speaker_signal(speaker, t, rng)
                + 0.01 * rng.standard_normal(n)).astype(np.float32)

    # build trial pairs: half same-speaker, half different
    waves_a, waves_b, labels = [], [], []
    for i in range(args.trials):
        same = i % 2 == 0
        s1 = speakers[rng.integers(len(speakers))]
        s2 = s1 if same else speakers[
            (speakers.index(s1) + 1 + rng.integers(len(speakers) - 1))
            % len(speakers)]
        waves_a.append(utterance(s1))
        waves_b.append(utterance(s2))
        labels.append(int(same))

    A = np.stack(waves_a)[:, None, :]
    B = np.stack(waves_b)[:, None, :]

    model(A[:8])  # warm up / compile
    t0 = time.perf_counter()
    emb_a = np.asarray(model(A))
    emb_b = np.asarray(model(B))
    elapsed = time.perf_counter() - t0

    na = emb_a / np.linalg.norm(emb_a, axis=1, keepdims=True)
    nb = emb_b / np.linalg.norm(emb_b, axis=1, keepdims=True)
    scores = np.sum(na * nb, axis=1)

    metric = EqualErrorRate()
    metric.update(scores, labels)
    eer = metric.compute()

    total_audio = 2 * args.trials * args.seconds
    print(json.dumps({
        "metric": "verification EER (synthetic trials)",
        "eer": round(eer, 4),
        "trials": args.trials,
        "embedding_seconds_per_audio_hour": round(
            elapsed / (total_audio / 3600.0), 2),
    }))


if __name__ == "__main__":
    main()
