"""pred_x_prev inpainting mode: rho table and end-to-end run."""

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.runner import Runner
from diffpir_tpu.schedule import NoiseSchedule, build_plan
from diffpir_tpu.utils import image as im

IMG = 64


def test_xprev_rho_table():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    plan = build_plan(s, iter_num=10, skip_type="quad", lambda_=1.0,
                      sigma_y=0.05, rho_mode="xprev")
    t = plan.t[3]
    expect = 0.05**2 / (s.betas[t] / (1 - s.betas[t]))
    assert plan.rho[3] == pytest.approx(expect, rel=1e-5)
    # differs from the xstart table
    plan2 = build_plan(s, iter_num=10, skip_type="quad", lambda_=1.0,
                       sigma_y=0.05, rho_mode="xstart")
    assert not np.allclose(plan.rho, plan2.rho)


@pytest.mark.parametrize("ddim", [False, True])
def test_xprev_inpaint_runs(tmp_path, ddim):
    rng = np.random.default_rng(0)
    tdir = tmp_path / "testsets" / "tiny"
    tdir.mkdir(parents=True)
    for i in range(2):
        x = np.zeros((IMG, IMG, 3), np.float32)
        x[:, :] = rng.random(3)
        x[20:44, 20:44] = rng.random(3)
        im.imsave(im.single2uint(x), str(tdir / f"img{i}.png"))
    cfg = load_config(None, dict(
        task="inpaint", model_name="tiny_test", testset_name="tiny",
        cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0, save_E=False,
        save_L=False, dtype="float32", noise_level_img=0,
        model_output_type="pred_x_prev", ddim_sample=ddim,
        mask_prob_range=[0.3, 0.3]))
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])
    # known pixels recovered exactly
    assert res["psnr"] > 8.0


def test_xprev_deblur_ignores_kernel(tmp_path):
    """pred_x_prev on deblur/sr runs the plain ancestral chain — the
    reference's analytic data solve is inpaint-only in this mode
    (main_ddpir.py:414); the kernel must not influence the restoration.
    Previously these configs silently fell through to the pred_xstart
    FFT-prox pipeline."""
    from diffpir_tpu.data import Batch

    cfg = load_config(None, dict(
        task="deblur", model_name="tiny_test", cwd=str(tmp_path),
        iter_num=3, batch_size=2, seed=0, save_E=False, save_L=False,
        dtype="float32", noise_level_img=0,
        model_output_type="pred_x_prev"))
    runner = Runner(cfg, use_mesh=False)
    rng = np.random.default_rng(0)
    img_H = rng.integers(0, 256, (2, IMG, IMG, 3)).astype(np.uint8)
    y = img_H.astype(np.float32) / 255.0
    k1 = np.zeros((2, 7, 7), np.float32); k1[:, 3, 3] = 1.0
    k2 = np.full((2, 7, 7), 1.0 / 49.0, np.float32)
    mask = np.ones_like(y)
    b1 = Batch(img_H=img_H, img_L=y, kernel=k1, mask=mask, names=["a", "b"])
    b2 = Batch(img_H=img_H, img_L=y, kernel=k2, mask=mask, names=["a", "b"])
    o1 = runner.restore_batch(b1, seed=0)
    o2 = runner.restore_batch(b2, seed=0)
    assert np.isfinite(o1).all()
    np.testing.assert_array_equal(o1, o2)
