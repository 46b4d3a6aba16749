"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is exercised on virtual CPU devices
(xla_force_host_platform_device_count) so the suite runs anywhere; the real
TPU path is covered by bench.py and __graft_entry__.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
