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


# ---------------------------------------------------------------------------
# Multi-host (the reference has only a vestigial DistributedSampler,
# semantic/lib/utils/data/distributed.py, with no entry point ever
# initializing torch.distributed — SURVEY.md §2.5.  Here multi-host is a
# first-class but optional path: a DCN x ICI mesh whose slow axis spans
# hosts.)
# ---------------------------------------------------------------------------

def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (JAX reads
    COORDINATOR_ADDRESS etc. / cloud metadata when args are None).
    Idempotent: safe to call when already initialized.

    The idempotency check reads jax's distributed global state directly:
    calling jax.process_count() here would itself initialize the XLA
    backend, after which jax.distributed.initialize unconditionally
    raises ("must be called before any JAX calls") — the old guard made
    multi-host init unreachable."""
    from jax._src import distributed

    if distributed.global_state.client is not None:   # already initialized
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def make_multihost_mesh(axis: str = DATA_AXIS,
                        hosts_axis: str = "hosts") -> Mesh:
    """2-D (hosts, data) mesh: the leading axis spans processes (gradient
    psum rides DCN), the fast axis spans each host's local chips (ICI).
    With one process this degenerates to [1, n_local] and the hosts axis
    is free."""
    n_proc = jax.process_count()
    devices = np.asarray(jax.devices())
    local = len(devices) // n_proc
    return Mesh(devices.reshape(n_proc, local), (hosts_axis, axis))


def multihost_batch_sharding(mesh: Mesh, axis: str = DATA_AXIS,
                             hosts_axis: str = "hosts") -> NamedSharding:
    """Shard the global batch over BOTH mesh axes (hosts major)."""
    return NamedSharding(mesh, P((hosts_axis, axis)))


def local_batch_slice(global_batch_size: int) -> slice:
    """This process's slice of the global batch (the DistributedSampler
    role: each host loads only its shard)."""
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
