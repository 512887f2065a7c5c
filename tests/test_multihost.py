"""Multi-host helpers on the virtual CPU mesh (single-process degenerate path)."""

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


def test_dryrun_restore_gate():
    """The driver's inference half of the multi-chip gate stays green."""
    from diffpir_tpu.runner import dryrun_restore

    dryrun_restore(8)
