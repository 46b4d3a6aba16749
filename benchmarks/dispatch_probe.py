"""Measure per-dispatch overhead on the relay-attached TPU.

Enqueues N back-to-back small device programs (no host sync between
them) and compares wall time to one fused program doing the same work
N times. If the relay serializes dispatch round-trips with compute,
the difference / N is the per-dispatch tax and fusing per-file device
programs into fewer dispatches is worth it; if dispatches pipeline,
the two should match.

    python benchmarks/dispatch_probe.py [--n 16] [--reps 5]
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
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # a ~5 ms matmul chain: big enough to not vanish in launch noise
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((2048, 2048)).astype(np.float32))

    @jax.jit
    def step(a):
        for _ in range(4):
            a = jnp.tanh(a @ a) * 0.1
        return a

    @jax.jit
    def fused(a):
        def body(carry, _):
            b = carry
            for _ in range(4):
                b = jnp.tanh(b @ b) * 0.1
            return b, ()
        out, _ = jax.lax.scan(body, a, None, length=args.n)
        return out

    # compile both
    np.asarray(step(x)[:1, :1])
    np.asarray(fused(x)[:1, :1])

    seq, fus = [], []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        a = x
        for _ in range(args.n):
            a = step(a)
        np.asarray(a[:1, :1])
        seq.append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        np.asarray(fused(x)[:1, :1])
        fus.append(time.perf_counter() - t0)

    per_dispatch_tax = (min(seq) - min(fus)) / args.n
    print(json.dumps({
        "n_dispatches": args.n,
        "sequential_best_s": round(min(seq), 4),
        "fused_best_s": round(min(fus), 4),
        "per_dispatch_tax_ms": round(per_dispatch_tax * 1e3, 2),
        "all_sequential_s": [round(v, 4) for v in seq],
        "all_fused_s": [round(v, 4) for v in fus],
    }, indent=2))


if __name__ == "__main__":
    main()
