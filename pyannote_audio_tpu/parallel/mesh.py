"""Device-mesh helpers for data/model parallel execution.

The reference's only distributed strategy is DDP via lightning
(SURVEY.md §2.8); the TPU-native mapping is sharding annotations under
jit. These helpers standardize the mesh axes used across the framework:

  * ``data``  — batch/chunk axis (training batches, inference chunks)
  * ``model`` — reserved for tensor-parallel layouts of large SSL trunks

Multi-host: pass the global device list; per-host data feeding uses
``jax.process_index()`` striding.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis_names: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    grid = np.asarray(devices).reshape(shape)
    return Mesh(grid, axis_names=axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/chunk) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put array(s) with the batch axis sharded over 'data'."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)


def pad_to_devices(n: int, num_devices: int) -> int:
    """Smallest multiple of num_devices >= n (batch divisibility)."""
    return -(-n // num_devices) * num_devices


def broadcast_from_host0(value: str) -> str:
    """Host-0 -> all-hosts string broadcast over DCN.

    Parity role: the reference's ``trainer.strategy.broadcast`` of the
    prepared-data cache path across DDP ranks (reference
    core/task.py:620-622; SURVEY.md §2.8 maps it to
    ``multihost_utils.broadcast_one_to_all``). Single-process runs
    return the value unchanged, so callers need no process-count
    branches.
    """
    if jax.process_count() == 1:
        return value
    from jax.experimental import multihost_utils
    data = np.frombuffer(value.encode("utf-8"), dtype=np.uint8)
    # fixed-length frame: agree on host 0's length first, then ship the
    # bytes (every host must contribute a same-shape buffer)
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray(len(data), dtype=np.int32)))
    buf = np.zeros(max(n, 1), dtype=np.uint8)
    buf[:min(len(data), n)] = data[:n]
    out = multihost_utils.broadcast_one_to_all(buf)
    return bytes(np.asarray(out[:n])).decode("utf-8")
