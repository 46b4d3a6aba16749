"""Micro-breakdown of the PyanNet segmentation forward on TPU.

Times (batch, 10 s) SincNet-only vs LSTM-only vs full forward at the
production batch size, so kernel work can be attributed before tuning.

    python benchmarks/seg_breakdown.py [--batch 256] [--iters 5]
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


def timeit(fn, *args, iters=5):
    # axon: block_until_ready is unreliable; sync via a TINY host fetch
    # (fetching the full output would time the relay transfer instead)
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.reshape(-1)[:1])
    sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pyannote_audio_tpu.core.model import (Problem, Resolution,
                                               Specifications)
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet

    model = PyanNet()
    model.specifications = Specifications(
        problem=Problem.MONO_LABEL_CLASSIFICATION,
        resolution=Resolution.FRAME, duration=10.0,
        classes=["a", "b", "c"], powerset_max_classes=2)
    model.build()

    B, T = args.batch, 160000
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((B, 1, T)).astype(np.float32))

    module = model.module
    params = model.params

    from pyannote_audio_tpu.models.blocks.sincnet import SincNet
    sinc = SincNet(stride=10, sample_rate=16000)
    sinc_params = {"params": params["params"]["sincnet"]}

    @jax.jit
    def full(p, x):
        return module.apply(p, x)

    @jax.jit
    def sincnet_only(p, x):
        return sinc.apply(p, x)

    t_full = timeit(full, params, x, iters=args.iters)
    t_sinc = timeit(sincnet_only, sinc_params, x, iters=args.iters)

    print(json.dumps({
        "batch": B,
        "full_forward_s": round(t_full, 4),
        "sincnet_s": round(t_sinc, 4),
        "lstm_plus_head_s": round(t_full - t_sinc, 4),
    }))
