"""Device-mesh construction and batch sharding.

The reference's only parallelism is vestigial NCCL/MPI training scaffolding
(``guided_diffusion/dist_util.py``) and an unused ``world_size``
(``main_ddpir.py:135``, SURVEY.md §2.7).  Here batched multi-chip inference is
first-class: a 1-D (or N-D) ``jax.sharding.Mesh`` with the batch dimension
sharded over the ``data`` axis; parameters are replicated; XLA inserts all
collectives (metric reductions ride ICI via ``psum`` inside jit).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and use
``jax.make_array_from_process_local_data`` for per-host input sharding — the
same mesh code path compiles unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "shard_image", "replicate"]


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """Mesh over all (or ``prod(shape)``) devices; default 1-D data-parallel."""
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def shard_batch(arr, mesh: Mesh, axis: Optional[str] = "data"):
    """Place an array with its leading (batch) dim sharded over `axis`.

    ``axis=None`` replicates (e.g. kernels on a space-only mesh)."""
    spec = P(axis, *([None] * (np.ndim(arr) - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def shard_image(arr, mesh: Mesh, data_axis: Optional[str] = "data",
                space_axis: Optional[str] = None):
    """Place an NHWC image batch with B over ``data_axis`` and H over
    ``space_axis`` (spatial parallelism).

    With H sharded, GSPMD partitions every conv spatially and inserts the
    halo exchanges (``collective-permute`` of kh//2 boundary rows per conv)
    and turns GroupNorm/attention spatial reductions into psums — the whole
    restore runs EXACTLY as on one device, with per-chip activation memory
    cut by the shard count.  This is the capability the reference
    approximates host-side with overlapping tiles (``utils_model.py:16-45``,
    ``test_mode 2``), which is inexact at tile seams."""
    spec = P(data_axis, space_axis, *([None] * (np.ndim(arr) - 2)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (e.g. model params) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
