"""Shared live-array HBM high-water sampler ("live_arrays@20Hz").

axon's device ``memory_stats()`` returns nothing, so perf artifacts
record peak HBM by sampling ``sum(nbytes of jax.live_arrays())`` at
~20 Hz during the timed passes. bench.py and benchmarks/longfile_tpu.py
both stamp ``peak_hbm_source: "live_arrays@20Hz"`` — like
benchmarks/relay_probes.py, ONE implementation keeps those rows
comparable across tools and rounds (a rate or filtering change here
renames the stamp for every user at once).

    sampler = HbmSampler().start()
    ... timed work ...
    peak = sampler.stop()
"""

from __future__ import annotations

import threading

#: stamped into artifacts next to peak_hbm_bytes
SOURCE = "live_arrays@20Hz"
_INTERVAL_S = 0.05


class HbmSampler:
    def __init__(self):
        self._stop = threading.Event()
        self._peak = 0
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        import jax
        while not self._stop.is_set():
            try:
                total = sum(int(getattr(a, "nbytes", 0) or 0)
                            for a in jax.live_arrays())
                self._peak = max(self._peak, total)
            except Exception:
                pass
            self._stop.wait(_INTERVAL_S)

    def start(self) -> "HbmSampler":
        self._thread.start()
        return self

    @property
    def peak(self) -> int:
        return self._peak

    def stop(self) -> int:
        self._stop.set()
        self._thread.join(timeout=1.0)
        return self._peak
