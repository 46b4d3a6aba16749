"""Training steps/s: is the train step compute-bound or input-bound?

VERDICT round-2 item 5's acceptance gate: with the threaded input
pipeline (Task.train_batches_parallel), the TPU train step should be
compute-bound — steps/s with num_workers=4 ~= steps/s with batches
pre-materialized in RAM (the pure-device ceiling), and both above the
inline num_workers=0 path.

Usage:
    python benchmarks/train_throughput.py [--steps 30] [--batch 32]
    (plain python = TPU; prefix env PALLAS_AXON_POOL_IPS= \
     JAX_PLATFORMS=cpu for a CPU smoke run with --steps 4)
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import numpy as np


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--duration", type=float, default=5.0)
    parser.add_argument("--workers", type=int, default=4)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from corpus import make_file
    from pyannote_audio_tpu.models.segmentation.pyannet import PyanNet
    from pyannote_audio_tpu.tasks.segmentation import SpeakerDiarization
    from pyannote_audio_tpu.train.trainer import make_train_step
    from pyannote_audio_tpu.utils.database import Protocol

    root = Path("/tmp/train_throughput_corpus")
    root.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    files = []
    for i in range(8):
        turns = []
        t = 0.5
        while t < 55.0:
            spk = ["alice", "bob", "carol"][rng.integers(3)]
            d = float(rng.uniform(1.0, 5.0))
            turns.append((spk, t, min(t + d, 59.0)))
            t += d * float(rng.uniform(0.6, 1.4))
        files.append(make_file(root / f"f{i}.wav", turns, duration=60.0,
                               seed=i))
    protocol = Protocol(name="bench", subsets={"train": files})

    task = SpeakerDiarization(protocol, duration=args.duration,
                              batch_size=args.batch,
                              num_workers=args.workers)
    model = PyanNet(task=task)
    task.setup(model)
    model.build(rng=jax.random.PRNGKey(0))

    optimizer = optax.adam(1e-3)
    step_fn = make_train_step(task, model, optimizer)

    from pyannote_audio_tpu.core.inference import _upload_waveform

    def run(batches, label):
        # fresh per-run state: the train step DONATES params/opt_state,
        # so each run must start from un-aliased copies
        params = jax.tree_util.tree_map(jnp.array, model.params)
        opt_state = optimizer.init(params)
        # warmup (compile) on the first batch
        first = next(batches)
        y = first.y
        w = None if first.weight is None else jnp.asarray(first.weight)
        meta = None if first.meta is None else {
            k: jnp.asarray(v) for k, v in first.meta.items()}
        params, opt_state, loss = step_fn(
            params, opt_state, _upload_waveform(first.X, quant="int16"),
            jnp.asarray(y), w, meta)
        np.asarray(loss)            # sync
        n = 0
        t0 = time.perf_counter()
        last = None
        for batch in batches:
            if n >= args.steps:
                break
            w = None if batch.weight is None \
                else jnp.asarray(batch.weight)
            meta = None if batch.meta is None else {
                k: jnp.asarray(v) for k, v in batch.meta.items()}
            params, opt_state, last = step_fn(
                params, opt_state,
                _upload_waveform(batch.X, quant="int16"),
                jnp.asarray(batch.y), w, meta)
            n += 1
        np.asarray(last)            # host sync closes the async chain
        dt = time.perf_counter() - t0
        result = {"mode": label, "steps": n, "steps_per_s": n / dt,
                  "chunk_s_per_s": n * args.batch * args.duration / dt}
        print(json.dumps(result))
        return result

    def endless(workers):
        task.num_workers = workers
        epoch = 0
        while True:
            yield from task.train_batches_parallel(epoch=epoch)
            epoch += 1

    # ceiling: one batch re-fed forever (zero input cost)
    one = next(task.train_batches(epoch=0))

    def repeat_one():
        while True:
            yield one

    ceiling = run(repeat_one(), "prematerialized")
    inline = run(endless(0), "num_workers=0")
    threaded = run(endless(args.workers), f"num_workers={args.workers}")
    verdict = {
        "compute_bound": threaded["steps_per_s"]
        >= 0.9 * ceiling["steps_per_s"],
        "threaded_speedup_vs_inline": threaded["steps_per_s"]
        / max(inline["steps_per_s"], 1e-9),
    }
    print(json.dumps(verdict))
    return 0


if __name__ == "__main__":
    sys.exit(main())
