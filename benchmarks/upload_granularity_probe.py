"""Does each host->device transfer pay a fixed relay cost?

The round-5 wall attribution (PROFILE60_r05.json) counted 37 uploads
per 60-minute file — one big dpcm4 waveform plus ~36 SMALL arrays
(per-batch gather starts / masks from the segmentation and embedding
loops). The wall equation priced uploads at bytes/bandwidth only; if
the relay also charges a per-TRANSFER cost (sync-latency-like, 2-8 ms
light / ~25 ms loaded), those small uploads are a hidden ~0.1-0.9 s
per file and coalescing them into one array would be the next win.

Method: time N x device_put of small arrays vs 1 x device_put of the
same total bytes, syncing once at the end via a host fetch of one
element from each buffer (fetch cost is shared by both shapes). Also
times the dispatch-side variant (jnp.asarray inside a jitted add) to
mirror how the pipeline actually feeds starts into dispatches.

    python benchmarks/upload_granularity_probe.py
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    results = {"platform": dev.platform}

    from benchmarks.relay_probes import relay_probes
    results["relay_before"] = relay_probes()

    def roundtrip(bufs):
        # ONE tiny fetch of the LAST buffer: the relay serializes
        # transfers, so the last buffer's fetch returning bounds all
        # earlier uploads. (v1 of this probe fetched one element from
        # EVERY buffer and thereby measured 29 ms per host SYNC, not
        # per upload — syncs round-trip, uploads enqueue.)
        np.asarray(bufs[-1][..., :1])

    def timed(fn, reps=5):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    # ---- many small puts vs one big put, same total bytes ----
    for n, small_elems in ((32, 256), (32, 262144)):
        small = [np.full((small_elems,), i, np.float32) for i in range(n)]
        big = np.concatenate(small)

        def many():
            roundtrip([jax.device_put(a, dev) for a in small])

        def one():
            roundtrip([jax.device_put(big, dev)])

        many_s = timed(many)
        one_s = timed(one)
        label = f"{n}x{small_elems * 4}B"
        results[label] = {
            "many_small_s": round(many_s, 4),
            "one_big_s": round(one_s, 4),
            "per_extra_transfer_ms": round(
                (many_s - one_s) / (n - 1) * 1000, 3),
        }

    # ---- do numpy args to jitted dispatches pay the same toll? ----
    # every pipeline dispatch passes np.int32 offsets / small numpy
    # index arrays; if each becomes a ~latency-priced transfer, the
    # dispatch loops hide a per-batch relay round-trip
    base = jax.device_put(np.zeros((1024,), np.float32), dev)

    @jax.jit
    def take(x, i):
        return jax.lax.dynamic_slice(x, (i,), (8,))

    dev_idx = [jax.device_put(np.int32(i), dev) for i in range(32)]
    _ = np.asarray(take(base, dev_idx[0]))   # compile once

    def dispatch_scalar_np():
        outs = [take(base, np.int32(i)) for i in range(32)]
        roundtrip([outs[-1]])

    def dispatch_scalar_dev():
        outs = [take(base, i) for i in dev_idx]
        roundtrip([outs[-1]])

    results["32_dispatches"] = {
        "np_scalar_arg_s": round(timed(dispatch_scalar_np), 4),
        "device_scalar_arg_s": round(timed(dispatch_scalar_dev), 4),
    }

    # ---- numpy ARRAY args (the pipeline's per-batch starts) ----
    # explicit jnp.asarray(batch_starts) pays the per-transfer toll;
    # does passing the numpy array straight into the jitted call ride
    # the dispatch message instead?
    @jax.jit
    def gather(x, idx):
        return x[idx]

    np_idx = [np.arange(256, dtype=np.int32) + i for i in range(32)]
    dev_idx_arr = [jax.device_put(a, dev) for a in np_idx]
    _ = np.asarray(gather(base, dev_idx_arr[0]))   # compile once

    def dispatch_array_np():
        outs = [gather(base, a) for a in np_idx]
        roundtrip([outs[-1]])

    def dispatch_array_asarray():
        outs = [gather(base, jnp.asarray(a)) for a in np_idx]
        roundtrip([outs[-1]])

    def dispatch_array_dev():
        outs = [gather(base, a) for a in dev_idx_arr]
        roundtrip([outs[-1]])

    results["32_dispatches_array_arg"] = {
        "np_array_arg_s": round(timed(dispatch_array_np), 4),
        "jnp_asarray_arg_s": round(timed(dispatch_array_asarray), 4),
        "device_array_arg_s": round(timed(dispatch_array_dev), 4),
    }

    results["relay_after"] = relay_probes()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import sys
    from pathlib import Path
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    main()
