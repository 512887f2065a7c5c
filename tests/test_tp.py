"""Tensor-parallel inference: Megatron-style UNet sharding (parallel/tp.py).

The reference has no model parallelism (``dist_util.py`` replicates params);
TP is a TPU-native capability addition.  Correctness bar: the dp x tp mesh
must reproduce single-device numerics — GSPMD partitioning only reorders
reductions, so fp32 outputs agree to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from diffpir_tpu.models.zoo import TINY_TEST_CONFIG
from diffpir_tpu.models.unet import UNet
from diffpir_tpu.parallel.mesh import make_mesh
from diffpir_tpu.parallel.tp import (shard_unet_params, tp_param_report,
                                     unet_tp_specs)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _tiny_model_and_params(seed=0):
    model = UNet(TINY_TEST_CONFIG, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(seed), x,
                        jnp.zeros((1,), jnp.int32))["params"]
    return model, params


def test_tp_forward_parity():
    """dp x tp sharded forward == single-device forward (fp32)."""
    model, params = _tiny_model_and_params()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    t = jnp.asarray([3, 100, 500, 999], jnp.int32)

    ref = model.apply({"params": params}, x, t)

    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    sharded = shard_unet_params(params, mesh, model.cfg)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    ts = jax.device_put(t, NamedSharding(mesh, P("data")))
    out = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(
        sharded, xs, ts)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_tp_specs_shard_bulk_of_params():
    """ResBlock/attention interiors (the bulk) are sharded; shards are real."""
    model, params = _tiny_model_and_params()
    rep = tp_param_report(params, model.cfg, n_model=4)
    assert rep["fraction"] > 0.5, rep

    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    sharded = shard_unet_params(params, mesh, model.cfg)
    k = sharded["input_blocks_1_0"]["conv1"]["kernel"]
    full = params["input_blocks_1_0"]["conv1"]["kernel"]
    shard_shape = k.addressable_shards[0].data.shape
    assert shard_shape[-1] == full.shape[-1] // 4, (shard_shape, full.shape)


def test_tp_fallback_replicates_on_indivisible():
    """Blocks whose heads/channels don't divide the axis stay replicated."""
    model, params = _tiny_model_and_params()
    # tiny config: 4 heads everywhere, all channel counts % 8 == 0 but
    # 32 groups % 8 == 0 too — force the attention fallback with n_model=8
    specs = unet_tp_specs(params, model.cfg, n_model=8)
    attn = [v for k, v in specs.items() if "qkv" in v]
    assert attn, "no attention blocks found"
    for s in attn:
        assert s["qkv"]["kernel"] == P(), s


def test_tp_bf16_compute_smoke():
    """Production combo: fp32 sharded params, bf16 compute — compiles and
    matches the unsharded bf16 forward."""
    model = UNet(TINY_TEST_CONFIG, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0,
                        jnp.zeros((1,), jnp.int32))["params"]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 64, 64, 3)), jnp.float32)
    t = jnp.full((4,), 42, jnp.int32)
    ref = model.apply({"params": params}, x, t)

    mesh = make_mesh((2, 4), axis_names=("data", "model"))
    sharded = shard_unet_params(params, mesh, model.cfg)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(
        sharded, xs, t)
    # bf16 compute: reduction reorder under sharding costs ~bf16 ulp
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), rtol=0, atol=0.05)


def test_tp_flagship_topologies_shard():
    """Both published checkpoints shard >96% of params at 2/4/8-way TP.

    Uses eval_shape — no 553M materialization.  Head counts
    (num_head_channels=64, reference ``script_util.py:148-158``) and
    channel multiples divide every mesh size a v5e/v5p slice offers.
    """
    from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS

    for name, cfg in MODEL_ZOO_CONFIGS.items():
        model = UNet(cfg, dtype=jnp.bfloat16)
        shapes = jax.eval_shape(
            lambda r: model.init(r, jnp.zeros((1, 256, 256, 3)),
                                 jnp.zeros((1,), jnp.int32)),
            jax.random.PRNGKey(0))["params"]
        for n in (2, 4, 8):
            rep = tp_param_report(shapes, cfg, n_model=n)
            assert rep["fraction"] > 0.9, (name, n, rep)


def test_tp_runner_restore_matches_single_device(tmp_path):
    """Full DiffPIR inpainting trajectory: dp x tp Runner == unsharded."""
    from diffpir_tpu.config import load_config
    from diffpir_tpu.data import Batch
    from diffpir_tpu.runner import Runner

    rng = np.random.default_rng(1)
    img_H = rng.integers(0, 256, (4, 64, 64, 3)).astype(np.uint8)
    mask = (rng.uniform(size=img_H.shape) > 0.3).astype(np.float32)
    img_L = img_H.astype(np.float32) * mask / 255.0
    batch = Batch(img_H=img_H, img_L=img_L, mask=mask,
                  kernel=np.ones((4, 1, 1), np.float32),
                  names=[f"im{i}" for i in range(4)])

    def _cfg(mesh_shape):
        return load_config(None, overrides=dict(
            task="inpaint", model_name="tiny_test", iter_num=3,
            batch_size=4, noise_level_img=0.0, seed=0, dtype="float32",
            save_E=False, save_L=False, cwd=str(tmp_path),
            mesh_shape=mesh_shape))

    ref = Runner(_cfg(None), use_mesh=False).restore_batch(batch, seed=0)
    out = Runner(_cfg((2, 4)), use_mesh=True).restore_batch(batch, seed=0)
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_tp_flagship_553m_restore_lowering():
    """Lower (not execute) the dp x tp 553M-flagship restore trajectory.

    VERDICT r2 item 4b: validates GSPMD sharding propagation at the real
    imagenet-flagship scale (256x256_diffusion_uncond topology, 553M params)
    on the virtual 8-device mesh — abstract params, so nothing is
    materialized and no compile runs.  The lowered module must carry the
    2x4 mesh and a sharding annotation on a TP-sharded parameter.
    """
    from diffpir_tpu.config import load_config
    from diffpir_tpu.runner import Runner

    cfg = load_config(None, overrides=dict(
        task="deblur", model_name="256x256_diffusion_uncond", iter_num=2,
        iter_num_U=1, batch_size=8, noise_level_img=0.05, seed=0,
        dtype="bfloat16", save_E=False, save_L=False, mesh_shape=(2, 4)))
    runner = Runner(cfg, use_mesh=True, abstract_params=True)
    assert runner.weights_provenance == "abstract"
    assert runner.mesh is not None and dict(runner.mesh.shape) == {
        "data": 2, "model": 4}

    # >90% of the 553M params must carry a model-axis sharding
    n_sharded = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(runner.params)
        if any(d is not None for d in p.sharding.spec))
    n_total = sum(int(np.prod(p.shape))
                  for p in jax.tree_util.tree_leaves(runner.params))
    assert n_total > 500e6, n_total
    assert n_sharded / n_total > 0.9

    lowered = runner.lower_restore(batch=8, height=256, width=256,
                                   kernel_hw=(25, 25))
    hlo = lowered.as_text()
    assert "num_partitions = 8" in hlo
    assert 'sdy.mesh @mesh = <["data"=2, "model"=4]>' in hlo
    assert '[{"model"}]' in hlo  # TP annotations survived into the module

    # executing a materialization-free Runner must fail loudly
    from diffpir_tpu.data import Batch

    with pytest.raises(RuntimeError, match="abstract"):
        runner.restore_batch(Batch(
            img_H=np.zeros((8, 256, 256, 3), np.uint8),
            img_L=np.zeros((8, 256, 256, 3), np.float32),
            kernel=np.ones((8, 1, 1), np.float32),
            mask=np.ones((8, 256, 256, 3), np.float32),
            names=[str(i) for i in range(8)]))
