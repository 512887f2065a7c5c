"""Sweeps must not recompile: (lambda, zeta) are runtime arguments.

The reference re-derives rho et al. on host every step (main_ddpir.py:274-286)
and its sweep loop (main_ddpir.py:200-210) simply reruns everything; here the
whole-trajectory program is compiled ONCE per shape and every sweep point
rides in through the TrajectoryPlan pytree + scalar args.  Before this held,
each ``--sweep`` value was a full recompile (~15 min/point through the axon
remote-TPU tunnel).
"""

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import Batch
from diffpir_tpu.runner import Runner


def _batch(task: str) -> Batch:
    rng = np.random.default_rng(0)
    img = rng.random((2, 32, 32, 3), np.float32)
    if task == "inpaint":
        mask = (rng.random((2, 32, 32, 3)) > 0.5).astype(np.float32)
        kern = np.ones((2, 1, 1), np.float32)
        img_l = img * mask
    else:
        mask = np.ones((2, 32, 32, 3), np.float32)
        kern = np.full((2, 5, 5), 1.0 / 25.0, np.float32)
        img_l = img
    return Batch(img_H=(img * 255).astype(np.uint8), img_L=img_l,
                 kernel=kern, mask=mask, names=["a", "b"])


@pytest.mark.parametrize("yaml,task", [
    ("configs/demo256_inpaint.yaml", "inpaint"),
    ("configs/demo256_deblur.yaml", "deblur"),
])
def test_sweep_single_compile(yaml, task):
    cfg = load_config(yaml, overrides={
        "model_name": "tiny_test", "iter_num": 5, "noise_level_img": 12.75})
    r = Runner(cfg, use_mesh=False)
    b = _batch(task)

    outs = [r.restore_batch(b, lambda_=lam, zeta=z)
            for lam, z in [(0.05, 0.25), (80.0, 0.25), (0.05, 0.9)]]
    fn = r._restore_jit["fn"]
    assert fn._cache_size() == 1, "sweep points must share ONE compiled program"
    # and the sweep arguments must actually flow into the computation.  The
    # inpaint prox is the identity on unknown pixels (mask=0) so lambda's
    # effect through a random tiny prior is indirect and small — assert
    # strictly-nonzero there, magnitude on deblur (rho enters the FFT solve).
    lam_tol = 1e-4 if task == "deblur" else 0.0
    assert np.abs(outs[0] - outs[1]).max() > lam_tol   # lambda (rho tables)
    assert np.abs(outs[0] - outs[2]).max() > 1e-4      # zeta (renoise mix)


def test_same_point_is_deterministic():
    cfg = load_config("configs/demo256_inpaint.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 5})
    r = Runner(cfg, use_mesh=False)
    b = _batch("inpaint")
    o1 = r.restore_batch(b, lambda_=7.0, seed=3)
    o2 = r.restore_batch(b, lambda_=7.0, seed=3)
    np.testing.assert_array_equal(o1, o2)


def test_per_sample_operating_points_match_scalar_rows():
    """A batch may carry heterogeneous (lambda, zeta): row i of the vector
    call must reproduce row i of the corresponding scalar call (noise is
    positional, so identical seeds give identical per-row streams).  The
    vector form is one additional trace, itself sweep-stable."""
    cfg = load_config("configs/demo256_deblur.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 5, "noise_level_img": 12.75})
    r = Runner(cfg, use_mesh=False)
    b = _batch("deblur")

    o_lo = r.restore_batch(b, lambda_=0.5, seed=3)
    o_hi = r.restore_batch(b, lambda_=50.0, seed=3)
    o_vec = r.restore_batch(b, lambda_=[0.5, 50.0], seed=3)
    np.testing.assert_allclose(o_vec[0], o_lo[0], atol=2e-5)
    np.testing.assert_allclose(o_vec[1], o_hi[1], atol=2e-5)

    o_z = r.restore_batch(b, lambda_=0.5, zeta=0.3, seed=3)
    o_zvec = r.restore_batch(b, lambda_=0.5, zeta=[1.0, 0.3], seed=3)
    np.testing.assert_allclose(o_zvec[0], o_lo[0], atol=2e-5)
    np.testing.assert_allclose(o_zvec[1], o_z[1], atol=2e-5)

    # scalar + vector forms only; every point reused one of the two programs
    assert r._restore_jit["fn"]._cache_size() == 2


def test_tune_operating_point_single_launch():
    """The lambda-grid autotuner scores every candidate from ONE vector
    launch and its rows agree with the scalar-trace restore."""
    cfg = load_config("configs/demo256_deblur.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 5, "noise_level_img": 12.75,
        "calc_SSIM": True})
    r = Runner(cfg, use_mesh=False)
    b = _batch("deblur")

    pts = [(0.5, None), (50.0, None), (0.5, 0.3)]
    res = r.tune_operating_point(pts, batch=b, seed=3)
    assert [x["lambda_"] for x in res["results"]] == [0.5, 50.0, 0.5]
    assert res["results"][2]["zeta"] == 0.3
    assert all("ssim" in x for x in res["results"])
    assert res["best"] == max(res["results"], key=lambda x: x["psnr"])
    assert res["output"].shape == b.img_L.shape[1:]
    # single (vector) trace compiled, reused on a second tune
    assert r._restore_jit["fn"]._cache_size() == 1
    res2 = r.tune_operating_point(pts, batch=b, seed=3)
    assert res2["results"] == res["results"]
    assert r._restore_jit["fn"]._cache_size() == 1

    # candidate rows carry their own operating point: row 0 must equal a
    # scalar-lambda restore of the same replica batch (scalar path = its own
    # trace, so this crosses program boundaries)
    from diffpir_tpu.data import Batch as _B
    rep = _B(img_H=np.repeat(b.img_H[:1], 3, 0),
             img_L=np.repeat(b.img_L[:1], 3, 0),
             kernel=np.repeat(b.kernel[:1], 3, 0),
             mask=np.repeat(b.mask[:1], 3, 0), names=["a"] * 3)
    o_scalar = r.restore_batch(rep, lambda_=0.5, seed=3)
    from diffpir_tpu.utils import image as im
    psnr0 = float(im.psnr_batch(o_scalar[:1] * 2 - 1,
                                (b.img_H[:1].astype(np.float32) / 255.0)
                                * 2 - 1))
    np.testing.assert_allclose(res["results"][0]["psnr"], psnr0, atol=1e-2)


def test_tune_operating_point_multi_image_mean():
    """indices=(i0, i1, ...) averages the grid over several val images with
    one launch each (same compiled program): candidate k's score must equal
    the mean of the single-image tunes, and seeds must line up (launch j uses
    base_seed + j, matching a single-image tune at seed base_seed + j)."""
    cfg = load_config("configs/demo32_inpaint.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 3, "noise_level_img": 12.75})
    r = Runner(cfg, use_mesh=False)
    pts = [(0.5, None), (8.0, None)]
    r0 = r.tune_operating_point(pts, index=0, seed=3)
    r1 = r.tune_operating_point(pts, index=1, seed=4)
    rm = r.tune_operating_point(pts, indices=(0, 1), seed=3)
    for k in range(len(pts)):
        np.testing.assert_allclose(
            rm["results"][k]["psnr"],
            (r0["results"][k]["psnr"] + r1["results"][k]["psnr"]) / 2,
            atol=1e-6)
    # all launches (single- and multi-image) share ONE compiled program
    assert r._restore_jit["fn"]._cache_size() == 1
    # the returned output is the best candidate's restore of the FIRST image
    assert rm["output"].shape == r0["output"].shape
    with pytest.raises(ValueError):
        r.tune_operating_point(pts, batch=_batch("inpaint"), indices=(0, 1))


def test_tune_operating_point_mesh_padding():
    """Candidate count that does not divide the mesh data axis is padded
    with replicas and sliced back — 3 candidates on 8 devices."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device conftest backend")
    cfg = load_config("configs/demo256_inpaint.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 3, "batch_size": 8})
    r = Runner(cfg, use_mesh=True)
    b = _batch("inpaint")
    res = r.tune_operating_point([(1.0, None), (7.0, None), (30.0, None)],
                                 batch=b)
    assert len(res["results"]) == 3
    assert res["best"] in res["results"]


def test_per_sample_lambda_under_mesh():
    """The per-sample vector rides the mesh 'data' axis with its batch rows
    (a lambda-grid over 8 devices = 8 different operating points, one per
    shard, in one launch)."""
    import jax

    if len(jax.devices()) < 8:
        import pytest as _pytest
        _pytest.skip("needs the 8-virtual-device conftest backend")
    rng = np.random.default_rng(0)
    img = rng.random((8, 32, 32, 3)).astype(np.float32)
    b = Batch(img_H=(img * 255).astype(np.uint8), img_L=img,
              kernel=np.full((8, 5, 5), 1 / 25.0, np.float32),
              mask=np.ones((8, 32, 32, 3), np.float32),
              names=[str(i) for i in range(8)])
    cfg = load_config("configs/demo256_deblur.yaml", overrides={
        "model_name": "tiny_test", "iter_num": 3, "noise_level_img": 12.75,
        "batch_size": 8})
    r = Runner(cfg, use_mesh=True)
    o_vec = r.restore_batch(b, lambda_=[0.5, 1, 2, 4, 8, 16, 32, 64], seed=3)
    o_lo = r.restore_batch(b, lambda_=0.5, seed=3)
    o_hi = r.restore_batch(b, lambda_=64.0, seed=3)
    np.testing.assert_allclose(o_vec[0], o_lo[0], atol=2e-5)
    np.testing.assert_allclose(o_vec[7], o_hi[7], atol=2e-5)
