"""Interleaved TPU perf A/B: rfft fbank vs composed-conv fbank.

Times the whole-file fbank program (the shared-trunk front-end) for a
10-minute waveform with the rfft path and the PYANNOTE_TPU_CONV_FBANK
composed-conv path, alternating within one process so shared-pool
drift can't bias the comparison. Also reports the max abs feature
difference between the two paths.

    python benchmarks/fbank_ab.py [--minutes 10] [--reps 5]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--minutes", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import importlib
    fb = importlib.import_module("pyannote_audio_tpu.ops.fbank")

    sr = 16000
    n = int(args.minutes * 60 * sr)
    rng = np.random.default_rng(0)
    wav = (0.05 * rng.standard_normal(n)).astype(np.float32) * 32768.0
    dev = jnp.asarray(wav)

    # two separately-jitted wrappers so both variants stay compiled
    def make(flag: str):
        def call(x):
            os.environ["PYANNOTE_TPU_CONV_FBANK"] = flag
            try:
                return fb.fbank_impl(x)
            finally:
                os.environ.pop("PYANNOTE_TPU_CONV_FBANK", None)
        return jax.jit(call)

    rfft_fn, conv_fn = make("0"), make("1")
    a = rfft_fn(dev)
    b = conv_fn(dev)
    max_diff = float(jnp.max(jnp.abs(a - b)))

    results = {"rfft": [], "conv": []}
    for _ in range(args.reps):
        for name, fn in (("rfft", rfft_fn), ("conv", conv_fn)):
            t0 = time.perf_counter()
            np.asarray(fn(dev)[..., :1])
            results[name].append(time.perf_counter() - t0)

    print(json.dumps({
        "audio_minutes": args.minutes,
        "max_abs_feature_diff": round(max_diff, 6),
        "best_s": {k: round(min(v), 4) for k, v in results.items()},
        "all_s": {k: [round(x, 4) for x in v]
                  for k, v in results.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
