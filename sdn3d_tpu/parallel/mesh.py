"""Device mesh + sharding helpers.

The reference's entire parallelism inventory (SURVEY.md §2.5) — DataParallel
scatter/gather, thread-pipe SyncBN, gradient-accumulation pseudo-batching —
collapses here into one 1-D data mesh: batches are sharded on the leading
axis, parameters replicated, and XLA inserts the psum/all-gather collectives
over ICI.  BatchNorm statistics become global automatically (the batch-mean
reductions are computed over the sharded axis), which *is* SyncBN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first n_devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_for_batch(batch_size: int, axis: str = DATA_AXIS) -> Mesh:
    """Data mesh over the largest divisor of batch_size that fits the
    device count (batches must divide evenly across the mesh)."""
    n = len(jax.devices())
    while batch_size % n:
        n -= 1
    return make_mesh(n, axis)


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """device_put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
