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


sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--trials", type=int, default=4)
    args = parser.parse_args()

    from corpus import build_debug_corpus
    from pyannote_audio_tpu.__main__ import main as cli

    # corpus + RTTM/UEM registry + debug pipeline checkpoint — the same
    # shared fixture the parity harness dry-run uses (tests/corpus.py)
    root = Path(tempfile.mkdtemp(prefix="pat_optimize_"))
    protocol = build_debug_corpus(root)
    ckpt = root / "pipeline"

    tuning = root / "tuning"
    cmd = ["optimize", str(ckpt), protocol,
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
