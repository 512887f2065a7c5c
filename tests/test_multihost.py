"""Multi-host layer: a REAL 2-process JAX cluster plus the in-process helpers.

``test_two_process_cluster_executes_dcn_path`` launches two subprocesses that
``jax.distributed.initialize`` against a local coordinator, assemble
per-process input shards with ``jax.make_array_from_process_local_data``
(the branch that is dead in single-process runs), execute a mesh-sharded
restore + one train step with XLA cross-process collectives, and must agree
bit-for-bit with a single-process reference — the psum-parity analogue of the
reference's MPI allreduce smoke (``guided_diffusion/dist_util.py:21-74``).
"""

import numpy as np

import jax

from diffpir_tpu.parallel.mesh import make_mesh
from diffpir_tpu.parallel.multihost import (
    globalize_batch, initialize, process_shard_info,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise or hang


def test_process_shard_info():
    shard, n = process_shard_info()
    assert shard == 0 and n == 1


def test_globalize_batch_shards_over_mesh():
    mesh = make_mesh()
    batch = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    arr = globalize_batch(batch, mesh)
    assert arr.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(arr), batch)
    # actually distributed: one shard per device along the data axis
    assert len(arr.sharding.device_set) == len(jax.devices())


def test_two_process_cluster_executes_dcn_path():
    """2 processes x 2 virtual devices: the multi-PROCESS branches run for
    real (initialize, make_array_from_process_local_data, allgather fetch),
    with restore/train parity vs a 1-process x 4-device run."""
    from diffpir_tpu.parallel.multihost import dryrun_multiprocess

    dryrun_multiprocess(num_processes=2, devices_per_process=2)


def test_dryrun_restore_gate():
    """The driver's inference half of the multi-chip gate stays green."""
    from diffpir_tpu.runner import dryrun_restore

    dryrun_restore(8)
