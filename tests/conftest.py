"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised on virtual CPU devices
(xla_force_host_platform_device_count) so the suite runs anywhere; the real
TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

# Skip axon TPU-plugin registration in subprocesses (the single-chip
# session grant serializes; concurrent JAX processes would deadlock).
# Note: sitecustomize already ran, so this only protects subprocesses
# spawned by tests; run pytest itself with PALLAS_AXON_POOL_IPS= for a
# fully TPU-free session.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/pyannote_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
