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

__all__ = ["initialize", "globalize_batch", "process_shard_info",
           "fetch_global", "dryrun_multiprocess"]


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


def fetch_global(x):
    """Fetch a (possibly cross-process) global array to host numpy.

    ``np.asarray`` refuses arrays spanning non-addressable devices; this
    all-gathers the missing shards over DCN (``multihost_utils``) — every
    process returns the FULL logical array.  Single-process arrays take the
    plain fetch path.
    """
    import numpy as np

    if getattr(x, "is_fully_addressable", True):
        return np.asarray(jax.device_get(x))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


# ---------------------------------------------------------------------------
# executable multi-process validation (the reference's MPI rendezvous +
# bcast smoke, dist_util.py:21-74, re-done as a JAX coordination-service
# cluster of subprocesses on virtual CPU devices)
# ---------------------------------------------------------------------------

def _worker_main(process_id: int, num_processes: int, port: int,
                 devices_per_process: int) -> None:
    """One cluster member: init DCN, restore a batch, take one train step.

    Emits a single JSON line with order-independent checksums; every process
    of the cluster (and a single-process reference run) must print identical
    values — that is the psum/collective parity the orchestrator asserts.
    """
    import json

    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    initialize(coordinator_address=f"127.0.0.1:{port}",
               num_processes=num_processes, process_id=process_id)
    n_global = num_processes * devices_per_process
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == n_global, jax.device_count()

    from diffpir_tpu.config import load_config
    from diffpir_tpu.data import Batch
    from diffpir_tpu.runner import Runner

    H = 32
    cfg = load_config(None, overrides=dict(
        task="inpaint", model_name="tiny_test", iter_num=2, iter_num_U=1,
        batch_size=n_global, noise_level_img=0.0, seed=0, dtype="float32",
        save_L=False, save_E=False, mesh_shape=(n_global,)))
    runner = Runner(cfg, use_mesh=True)

    # deterministic GLOBAL batch; this process keeps only ITS rows — the
    # honest DCN input path (train.datasets shards files the same way)
    rng = np.random.default_rng(0)
    img_H = rng.integers(0, 256, (n_global, H, H, 3)).astype(np.uint8)
    mask = (rng.uniform(size=img_H.shape) > 0.5).astype(np.float32)
    img_L = img_H.astype(np.float32) * mask / 255.0
    shard, n_shards = process_shard_info()
    lo, hi = shard * (n_global // n_shards), (shard + 1) * (n_global // n_shards)
    local = Batch(img_H=img_H[lo:hi], img_L=img_L[lo:hi],
                  kernel=np.ones((hi - lo, 1, 1), np.float32),
                  mask=mask[lo:hi],
                  names=[f"im{i}" for i in range(lo, hi)])
    out = runner.restore_batch(local)  # global restore; allgathered fetch
    assert out.shape == img_H.shape, (out.shape, img_H.shape)
    restore_mean = float(np.mean(out))

    from diffpir_tpu.train.loop import dryrun_train_step

    loss = dryrun_train_step(n_global)
    print(json.dumps({"process": process_id,
                      "num_processes": jax.process_count(),
                      "restore_mean": round(restore_mean, 6),
                      "train_loss": round(float(loss), 6)}), flush=True)


def dryrun_multiprocess(num_processes: int = 2,
                        devices_per_process: int = 4,
                        timeout: float = 900.0) -> None:
    """Execute the REAL multi-process path: an n-process JAX cluster on
    virtual CPU devices, per-process input shards assembled with
    ``make_array_from_process_local_data``, XLA cross-process collectives
    inside jit, and allgathered fetches — then assert bit-level agreement
    across processes and parity with a single-process run of the same
    computation (the psum-parity check).
    """
    import json
    import os
    import socket
    import subprocess
    import sys

    with socket.socket() as s:  # free coordinator port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    def spawn(pid: int, nproc: int, dev: int, prt: int):
        env = dict(os.environ)
        flags = env.get("XLA_FLAGS", "")
        # replace any inherited forced device count with this worker's
        flags = " ".join(f for f in flags.split()
                         if "host_platform_device_count" not in f)
        env["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={dev}".strip())
        env.pop("JAX_PLATFORMS", None)
        return subprocess.Popen(
            [sys.executable, "-m", "diffpir_tpu.parallel.multihost",
             "worker", str(pid), str(nproc), str(prt), str(dev)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)

    procs = [spawn(i, num_processes, devices_per_process, port)
             for i in range(num_processes)]
    # single-process reference over the SAME global device count
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        ref_port = s.getsockname()[1]
    procs.append(spawn(0, 1, num_processes * devices_per_process, ref_port))

    rows = []
    for k, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"multiprocess worker {k} timed out after {timeout}s")
        if p.returncode != 0:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"multiprocess worker {k} rc={p.returncode}; stderr tail:\n"
                f"{err[-2000:]}")
        rows.append(json.loads(out.strip().splitlines()[-1]))

    ref = rows.pop()
    assert ref["num_processes"] == 1
    for r in rows:
        assert r["num_processes"] == num_processes, rows
        for key in ("restore_mean", "train_loss"):
            if abs(r[key] - ref[key]) > 5e-5:
                raise AssertionError(
                    f"{key} mismatch: process {r['process']} of "
                    f"{num_processes} got {r[key]}, single-process reference "
                    f"got {ref[key]}")
    print(f"dryrun_multiprocess({num_processes}x{devices_per_process}): OK "
          f"(DCN cluster restore+train, psum parity vs single process)")


if __name__ == "__main__":
    import sys

    if len(sys.argv) >= 6 and sys.argv[1] == "worker":
        _worker_main(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
                     int(sys.argv[5]))
    else:
        dryrun_multiprocess(int(sys.argv[1]) if len(sys.argv) > 1 else 2,
                            int(sys.argv[2]) if len(sys.argv) > 2 else 4)
