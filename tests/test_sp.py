"""Spatial parallelism (sp): activations sharded on image height.

The reference handles images too large for one device HOST-SIDE, with
overlapping tiles recursively averaged at seams (``utils_model.py:16-45``,
test_mode 2) — approximate at the seams and still bounded by one GPU's
memory per tile.  Here the same problem is solved the TPU way: shard the
image's H dim over a ``"space"`` mesh axis (``parallel/mesh.py:shard_image``),
replicate the params, and let GSPMD partition every conv (halo-exchanging
kh//2 boundary rows over ICI) and turn GroupNorm/attention spatial
reductions into psums.  The restore is EXACT — bit-comparable to the
single-device result — with per-chip activation memory divided by the
shard count.

These tests run on the 8-virtual-device CPU mesh (tests/conftest.py).
"""

import jax
import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import Batch
from diffpir_tpu.runner import Runner


def _batch(rng, n, h, task, sf=1):
    img_H = rng.integers(0, 256, (n, h, h, 3)).astype(np.uint8)
    mask = np.ones(img_H.shape, np.float32)
    kernel = np.ones((n, 1, 1), np.float32)
    if task == "inpaint":
        mask = (rng.uniform(size=img_H.shape) > 0.3).astype(np.float32)
        img_L = img_H.astype(np.float32) * mask / 255.0
    elif task == "deblur":
        k = np.zeros((7, 7), np.float32)
        k[3, 3] = 1.0
        kernel = np.broadcast_to(k, (n, 7, 7)).copy()
        img_L = img_H.astype(np.float32) / 255.0
    else:  # sr
        k = np.zeros((7, 7), np.float32)
        k[3, 3] = 1.0
        kernel = np.broadcast_to(k, (n, 7, 7)).copy()
        img_L = (img_H.astype(np.float32) / 255.0)[:, ::sf, ::sf]
    return Batch(img_H=img_H, img_L=img_L.astype(np.float32), kernel=kernel,
                 mask=mask, names=[f"im{i}" for i in range(n)])


def _cfg(tmp_path, task, mesh_shape, mesh_axes, **kw):
    base = dict(
        task=task, model_name="tiny_test", iter_num=3, batch_size=2,
        noise_level_img=0.0, seed=0, dtype="float32",
        save_E=False, save_L=False, cwd=str(tmp_path),
        mesh_shape=mesh_shape, mesh_axes=mesh_axes)
    base.update(kw)
    return load_config(None, overrides=base)


@pytest.mark.parametrize("task", ["inpaint", "deblur", "sr"])
def test_sp_restore_matches_single_device(tmp_path, task):
    """dp x sp Runner == unsharded, for every prox family.

    deblur/sr route the sharded x through the FFT prox — GSPMD gathers
    spatially for the FFT and re-shards after (correct; the conv/attention
    bulk stays spatial-parallel)."""
    rng = np.random.default_rng(2)
    kw = dict(sf=2, sr_mode="blur") if task == "sr" else {}
    batch = _batch(rng, 2, 64, task, sf=2)
    ref = Runner(_cfg(tmp_path, task, None, None, **kw),
                 use_mesh=False).restore_batch(batch, seed=0)
    out = Runner(_cfg(tmp_path, task, (2, 4), ("data", "space"), **kw),
                 use_mesh=True).restore_batch(batch, seed=0)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_sp_space_only_batch1(tmp_path):
    """8-way pure spatial sharding of a single image (the high-res,
    batch-1 use case: one image too large for one chip)."""
    rng = np.random.default_rng(3)
    batch = _batch(rng, 1, 64, "inpaint")
    ref = Runner(_cfg(tmp_path, "inpaint", None, None, batch_size=1),
                 use_mesh=False).restore_batch(batch, seed=0)
    out = Runner(_cfg(tmp_path, "inpaint", (8,), ("space",), batch_size=1),
                 use_mesh=True).restore_batch(batch, seed=0)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_sp_input_sharding_is_spatial(tmp_path):
    """The jitted restore's y input really is H-sharded on the mesh (not
    silently gathered to one device before dispatch)."""
    runner = Runner(_cfg(tmp_path, "inpaint", (2, 4), ("data", "space")),
                    use_mesh=True)
    assert runner.mesh_axes == ("data", "space")
    assert runner.mesh.shape == {"data": 2, "space": 4}
    from diffpir_tpu.parallel.mesh import shard_image

    y = shard_image(np.zeros((2, 64, 64, 3), np.float32), runner.mesh,
                    "data", "space")
    db = y.sharding.shard_shape(y.shape)
    assert db == (1, 16, 64, 3), db


def test_sp_lowering_has_spatial_collectives(tmp_path):
    """Compile (not execute) the sp restore: the partitioned HLO must
    contain spatial halo exchanges (collective-permute) — proof the SPMD
    partitioner actually split the convs instead of gathering the image.
    (Lowered-but-uncompiled modules only carry sdy sharding annotations;
    collectives are inserted by the partitioner at compile time.)"""
    runner = Runner(_cfg(tmp_path, "inpaint", (2, 4), ("data", "space")),
                    use_mesh=True, abstract_params=True)
    lowered = runner.lower_restore(batch=2, height=64, width=64)
    assert '"space"' in lowered.as_text(), "space axis missing from mesh"
    txt = lowered.compile().as_text()
    assert ("collective-permute" in txt or "collective_permute" in txt), \
        "no halo exchange in compiled sp module"


def test_mesh_axes_validation():
    with pytest.raises(ValueError, match="mesh_axes entries"):
        load_config(None, overrides=dict(mesh_shape=(2, 4),
                                         mesh_axes=("data", "pipeline")))
    with pytest.raises(ValueError, match="must match mesh_shape"):
        load_config(None, overrides=dict(mesh_shape=(2, 4),
                                         mesh_axes=("data",)))
    with pytest.raises(ValueError, match="unique"):
        load_config(None, overrides=dict(mesh_shape=(2, 4),
                                         mesh_axes=("space", "space")))


def test_sp_with_tp(tmp_path):
    """3-D mesh: data x model x space — TP param sharding composes with
    spatial activation sharding (2 x 2 x 2 on the 8-device mesh)."""
    rng = np.random.default_rng(4)
    batch = _batch(rng, 2, 64, "inpaint")
    ref = Runner(_cfg(tmp_path, "inpaint", None, None),
                 use_mesh=False).restore_batch(batch, seed=0)
    out = Runner(_cfg(tmp_path, "inpaint", (2, 2, 2),
                      ("data", "model", "space")),
                 use_mesh=True).restore_batch(batch, seed=0)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)
