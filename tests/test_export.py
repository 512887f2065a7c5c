"""AOT export (jax.export bundle) round-trips the restore program.

The exported StableHLO artifact must reproduce `Runner.restore_batch`
bit-for-bit: same trajectory program, same params, same PRNG stream.
"""

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import Batch
from diffpir_tpu.export import load_bundle, save_bundle
from diffpir_tpu.runner import Runner


def _cfg(task, **kw):
    base = dict(
        task=task, model_name="tiny_test", iter_num=3, iter_num_U=1,
        batch_size=2, noise_level_img=0.02, seed=0, dtype="float32",
        save_E=False, save_L=False)
    base.update(kw)
    return load_config(None, overrides=base)


def _batch(task, rng, B=2, H=32):
    img_H = rng.integers(0, 256, (B, H, H, 3)).astype(np.uint8)
    mask = np.ones((B, H, H, 3), np.float32)
    kernel = np.ones((B, 1, 1), np.float32)
    if task == "inpaint":
        mask = (rng.uniform(size=(B, H, H, 3)) > 0.3).astype(np.float32)
        img_L = img_H.astype(np.float32) * mask / 255.0
    else:  # deblur
        k = np.zeros((5, 5), np.float32)
        k[1:4, 1:4] = 1.0 / 9.0
        kernel = np.broadcast_to(k, (B, 5, 5)).copy()
        img_L = img_H.astype(np.float32) / 255.0
    return Batch(img_H=img_H, img_L=img_L.astype(np.float32), kernel=kernel,
                 mask=mask, names=[f"im{i}" for i in range(B)])


@pytest.mark.parametrize("task", ["inpaint", "deblur"])
def test_bundle_roundtrip_matches_runner(tmp_path, task):
    rng = np.random.default_rng(0)
    cfg = _cfg(task)
    runner = Runner(cfg, use_mesh=False)
    batch = _batch(task, rng)

    want = runner.restore_batch(batch, seed=7)

    path = save_bundle(
        runner, str(tmp_path / "bundle"), batch=2, height=32, width=32,
        kernel_hw=tuple(batch.kernel.shape[1:]), platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    got = loaded(batch.img_L, kernel=batch.kernel, mask=batch.mask, seed=7)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


@pytest.mark.parametrize("mesh_shape", [(8,), (2, 4)])
def test_mesh_bundle_matches_single_device(tmp_path, mesh_shape):
    """dp and dp x tp mesh bundles reproduce the unsharded runner's output."""
    rng = np.random.default_rng(2)
    B = 8
    cfg_plain = _cfg("inpaint", batch_size=B)
    runner_plain = Runner(cfg_plain, use_mesh=False)
    batch = _batch("inpaint", rng, B=B)
    want = runner_plain.restore_batch(batch, seed=5)

    cfg_mesh = _cfg("inpaint", batch_size=B, mesh_shape=list(mesh_shape))
    runner_mesh = Runner(cfg_mesh, use_mesh=True)
    assert runner_mesh.mesh is not None
    path = save_bundle(runner_mesh, str(tmp_path / "mesh_bundle"), batch=B,
                       height=32, width=32, platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    assert loaded.manifest["mesh"]["shape"] == list(mesh_shape)
    got = loaded(batch.img_L, mask=batch.mask, seed=5)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_bundle_manifest_and_validation(tmp_path):
    rng = np.random.default_rng(1)
    cfg = _cfg("inpaint")
    runner = Runner(cfg, use_mesh=False)
    path = save_bundle(runner, str(tmp_path / "b"), batch=2, height=32,
                       width=32, platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    assert loaded.manifest["task"] == "inpaint"
    assert loaded.manifest["batch"] == 2
    with pytest.raises(ValueError, match="y must be"):
        loaded(np.zeros((1, 32, 32, 3), np.float32))
    # defaults: identity mask/kernel — runs end to end
    out = loaded(rng.uniform(size=(2, 32, 32, 3)).astype(np.float32))
    assert np.isfinite(out).all()


def test_reload_params_refreshes_checkpoint(tmp_path):
    """Swapping params.npz changes the output without re-exporting."""
    rng = np.random.default_rng(4)
    runner = Runner(_cfg("inpaint"), use_mesh=False)
    path = save_bundle(runner, str(tmp_path / "b"), batch=2, height=32,
                       width=32, platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    batch = _batch("inpaint", rng)
    out1 = loaded(batch.img_L, mask=batch.mask, seed=1)

    # a differently-initialized runner -> different params, same program
    runner2 = Runner(_cfg("inpaint", seed=1), use_mesh=False)
    import jax as _jax
    # additive perturbation: the fixture UNet's zero-init output conv makes
    # multiplicative tweaks invisible (0 * c == 0)
    runner2.params = _jax.tree_util.tree_map(lambda p: p + 0.01, runner2.params)
    path2 = save_bundle(runner2, str(tmp_path / "b2"), batch=2, height=32,
                        width=32, platforms=("cpu",), allow_random_weights=True)
    loaded.reload_params(path2)
    out2 = loaded(batch.img_L, mask=batch.mask, seed=1)
    assert np.abs(out1 - out2).max() > 0
    with pytest.raises(ValueError, match="layout"):
        bad = str(tmp_path / "bad.npz")
        np.savez(bad, **{"0": np.zeros((3, 3), np.float32)})
        loaded.reload_params(bad)


def test_dynamic_point_bundle(tmp_path):
    """dynamic_point=True exports (lambda, zeta) as per-sample runtime
    arguments: one artifact serves every operating point, matching the live
    vector path; fixed bundles refuse call-time points."""
    rng = np.random.default_rng(3)
    cfg = _cfg("deblur", noise_level_img=12.75)
    runner = Runner(cfg, use_mesh=False)
    batch = _batch("deblur", rng)

    path = save_bundle(runner, str(tmp_path / "dyn"), batch=2, height=32,
                       width=32, kernel_hw=(5, 5), dynamic_point=True,
                       platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    assert loaded.manifest["dynamic_point"] is True

    # manifest default == the runner's configured point
    want_def = runner.restore_batch(batch, seed=7)
    got_def = loaded(batch.img_L, kernel=batch.kernel, mask=batch.mask, seed=7)
    np.testing.assert_allclose(got_def, want_def, rtol=0, atol=1e-5)

    # scalar override and per-sample vector override match the live path
    want_hi = runner.restore_batch(batch, lambda_=50.0, seed=7)
    got_hi = loaded(batch.img_L, kernel=batch.kernel, mask=batch.mask,
                    seed=7, lambda_=50.0)
    np.testing.assert_allclose(got_hi, want_hi, rtol=0, atol=1e-5)

    got_vec = loaded(batch.img_L, kernel=batch.kernel, mask=batch.mask,
                     seed=7, lambda_=[cfg.lambda_, 50.0])
    np.testing.assert_allclose(got_vec[0], want_def[0], rtol=0, atol=1e-5)
    np.testing.assert_allclose(got_vec[1], want_hi[1], rtol=0, atol=1e-5)

    # a fixed-point bundle refuses call-time operating points
    fixed = load_bundle(save_bundle(
        runner, str(tmp_path / "fix"), batch=2, height=32, width=32,
        kernel_hw=(5, 5), platforms=("cpu",), allow_random_weights=True))
    with pytest.raises(ValueError, match="dynamic_point"):
        fixed(batch.img_L, kernel=batch.kernel, mask=batch.mask, lambda_=3.0)


def test_dynamic_point_mesh_bundle(tmp_path):
    """Dynamic-point export composes with mesh bundles: the (lambda, zeta)
    vectors ride the data axis."""
    rng = np.random.default_rng(5)
    B = 8
    batch = _batch("inpaint", rng, B=B)
    runner_plain = Runner(_cfg("inpaint", batch_size=B), use_mesh=False)
    want = runner_plain.restore_batch(batch, lambda_=9.0, seed=2)

    runner_mesh = Runner(_cfg("inpaint", batch_size=B, mesh_shape=[8]),
                         use_mesh=True)
    path = save_bundle(runner_mesh, str(tmp_path / "dynmesh"), batch=B,
                       height=32, width=32, dynamic_point=True,
                       platforms=("cpu",), allow_random_weights=True)
    loaded = load_bundle(path)
    got = loaded(batch.img_L, mask=batch.mask, seed=2, lambda_=9.0)
    np.testing.assert_allclose(got, want, rtol=0, atol=5e-5)


def test_export_refuses_random_weights(tmp_path):
    """Exporting an AOT bundle over random weights hard-fails unless
    explicitly allowed (tests above opt in for the tiny fixture)."""
    cfg = _cfg("inpaint")
    runner = Runner(cfg, use_mesh=False)
    assert runner.weights_provenance == "random"
    with pytest.raises(RuntimeError, match="random"):
        save_bundle(runner, str(tmp_path / "nope"), batch=2, height=32,
                    width=32, platforms=("cpu",))
