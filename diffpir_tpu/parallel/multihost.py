"""Multi-host (multi-process) utilities.

The reference's multi-node layer is MPI rendezvous + NCCL/gloo process groups
plus MPI-chunked checkpoint broadcast (``guided_diffusion/dist_util.py:21-74``).
The TPU-native equivalents:

  * process bootstrap: ``jax.distributed.initialize()`` (DCN handled by the
    runtime; no address/port plumbing)
  * per-host input sharding: each process loads its shard
    (``train.datasets.load_data`` already shards by ``jax.process_index()``)
    and ``globalize_batch`` assembles the logical global array over the mesh
    via ``jax.make_array_from_process_local_data``
  * checkpoint distribution: orbax reads are already multi-host-aware — no
    broadcast step exists.

Single-process environments degrade to no-ops, so the same code path runs in
CI on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["initialize", "globalize_batch", "process_shard_info"]


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Bootstrap multi-process JAX; no-op when single-process."""
    if num_processes in (None, 1) and coordinator_address is None:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def process_shard_info() -> tuple[int, int]:
    """(shard, num_shards) for input pipelines — MPI rank/world equivalent."""
    return jax.process_index(), jax.process_count()


def globalize_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Assemble per-process local batches into one global sharded array.

    ``local_batch`` is this process's slice (leading dim = global_batch /
    process_count).  Under a single process this is equivalent to
    ``device_put`` with the data-axis sharding.
    """
    spec = P(axis, *([None] * (local_batch.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local_batch, sharding)
    return jax.make_array_from_process_local_data(sharding, local_batch)
