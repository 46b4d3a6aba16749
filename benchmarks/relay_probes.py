"""Single source of the relay calibration recipe ("chained-v2").

bench.py, benchmarks/profile_stages.py and benchmarks/window_hunter.py
all stamp relay calibration into perf artifacts, and the
``probe_version`` string exists so rows from different tools and rounds
are comparable — which only holds if the recipe cannot fork. This module
is that single recipe:

- latency: round-trip of a tiny 128x128 matmul program — measures the
  relay sync, not compute (2-8 ms light, 22-33 ms loaded).
- TFLOP/s: a CHAIN of ``mm_iters()`` 4096^3 bf16 matmuls inside one
  program (fori_loop with the operand as init performs exactly
  ``mm_iters()`` products). One matmul is ~0.7 ms at peak, far below the
  relay sync, so a single-matmul probe would just re-measure latency;
  the chain (~45 ms at peak) is compute-dominated. The final jnp.sum
  forces every entry (a [:1,:1] slice could let XLA elide work) and the
  operand is scaled to spectral norm < 1 so the powers stay in bf16
  range. HOURSCALE_r04 run1's 5.5 TFLOP/s used the retired
  single-matmul probe ("single-v1") — NOT comparable with these rows.
- upload bandwidth: a 16 MB host->device transfer + 1-element touch;
  loaded windows degrade the relay's host->device bandwidth far more
  than chip compute, and upload bytes are the pipeline's hard floor.

Compiled probe programs are cached at module level: repeated calls
(window hunting, per-pass brackets) re-run the same executables instead
of re-tracing — on axon, re-tracing would mean a remote compile per
probe.
"""

from __future__ import annotations

import os
import time

import numpy as np

UPLOAD_BYTES = 16 * 1024 * 1024

_state: dict = {}


def mm_iters() -> int:
    """Chain length: 64 on accelerators (~9 TFLOP — trivial on TPU,
    minutes on a CPU smoke), 2 off-accelerator; BENCH_MM_ITERS wins."""
    import jax
    return int(os.environ.get(
        "BENCH_MM_ITERS",
        "64" if jax.devices()[0].platform != "cpu" else "2"))


def probe_version() -> str:
    return f"chained-v2/iters={mm_iters()}"


def _ensure() -> dict:
    if _state:
        return _state
    import jax
    import jax.numpy as jnp
    iters = mm_iters()
    mm_small = jax.jit(lambda a, b: (a @ b)[:1, :1].astype(jnp.float32))

    def mm_chain(a):
        x = jax.lax.fori_loop(0, iters, lambda i, x: x @ a, a)
        return jnp.sum(x.astype(jnp.float32))

    mm_big = jax.jit(mm_chain)
    touch = jax.jit(lambda x: x[:1].astype(jnp.int32))
    small = jnp.zeros((128, 128), jnp.bfloat16)
    big = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4096, 4096)).astype(np.float32) / 150.0, jnp.bfloat16)
    payload = np.zeros(UPLOAD_BYTES, np.uint8)
    # compile + warm every probe program up front
    np.asarray(mm_small(small, small))
    np.asarray(mm_big(big))
    np.asarray(touch(jnp.asarray(payload)))
    _state.update(mm_small=mm_small, mm_big=mm_big, touch=touch,
                  small=small, big=big, payload=payload, iters=iters,
                  jnp=jnp)
    return _state


def probe_latency_ms(reps: int = 3) -> float:
    s = _ensure()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(s["mm_small"](s["small"], s["small"]))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def probe_tflops(reps: int = 2) -> float:
    s = _ensure()
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(s["mm_big"](s["big"]))
        best = max(best, 2 * 4096 ** 3 * s["iters"]
                   / (time.perf_counter() - t0) / 1e12)
    return best


def probe_upload_mb_per_s(reps: int = 3) -> float:
    s = _ensure()
    best = 0.0
    for rep in range(reps):
        s["payload"][rep % UPLOAD_BYTES] = rep + 1  # defeat buffer reuse
        t0 = time.perf_counter()
        np.asarray(s["touch"](s["jnp"].asarray(s["payload"])))
        best = max(best, UPLOAD_BYTES / (time.perf_counter() - t0) / 1e6)
    return best


def relay_probes(reps: int = 3) -> dict:
    """The full calibration row stamped into artifacts."""
    _ensure()
    return {"probe_ms": round(probe_latency_ms(reps), 3),
            "tflops": round(probe_tflops(max(2, reps - 1)), 1),
            "upload_mb_per_s": round(probe_upload_mb_per_s(reps), 1),
            "probe_version": probe_version()}
