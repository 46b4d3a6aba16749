"""Does host->device transfer overlap device compute on this backend?

Times (a) N uploads alone, (b) a compute loop alone, (c) interleaved
uploads + compute. If (c) ~= max(a, b), transfer and compute overlap
(separate DMA path); if (c) ~= a + b they serialize, and reducing
uploaded bytes is the only transfer lever.

    python benchmarks/overlap_probe.py
"""

from __future__ import annotations

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
    import jax
    import jax.numpy as jnp

    n_uploads = 3
    upload_mb = 19.2        # one 10-min int16 waveform
    wavs = [np.random.default_rng(i).integers(
        -1000, 1000, size=int(upload_mb * 1e6 / 2), dtype=np.int16)
        for i in range(n_uploads)]

    # compute that takes roughly as long as the uploads
    a = jnp.asarray(np.random.default_rng(9).standard_normal(
        (2048, 2048)).astype(np.float32))

    @jax.jit
    def burn(x, iters):
        def body(i, y):
            return jnp.tanh(y @ x)
        return jax.lax.fori_loop(0, iters, body, x)

    def sync(x):
        np.asarray(x.reshape(-1)[:1])

    sync(burn(a, 1))
    sync(jnp.asarray(wavs[0]))

    def time_uploads():
        t0 = time.perf_counter()
        bufs = [jnp.asarray(w) for w in wavs]
        for b in bufs:
            sync(b)
        return time.perf_counter() - t0

    def time_compute(iters):
        t0 = time.perf_counter()
        sync(burn(a, iters))
        return time.perf_counter() - t0

    t_up = min(time_uploads() for _ in range(3))
    # calibrate compute to ~t_up
    iters = 50
    t_c = time_compute(iters)
    iters = max(1, int(iters * t_up / t_c))
    t_comp = min(time_compute(iters) for _ in range(3))

    def time_both():
        t0 = time.perf_counter()
        out = burn(a, iters)           # queue compute first
        bufs = [jnp.asarray(w) for w in wavs]
        sync(out)
        for b in bufs:
            sync(b)
        return time.perf_counter() - t0

    t_both = min(time_both() for _ in range(3))
    print(json.dumps({
        "uploads_s": round(t_up, 3),
        "compute_s": round(t_comp, 3),
        "interleaved_s": round(t_both, 3),
        "serial_sum_s": round(t_up + t_comp, 3),
        "overlap_fraction": round(
            (t_up + t_comp - t_both) / min(t_up, t_comp), 2)
        if min(t_up, t_comp) > 0 else None,
    }))


if __name__ == "__main__":
    main()
