"""Deblur pipeline variants: motion kernels and the Levin09 PSF set."""

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import load_kernel_asset, prepare_images
from diffpir_tpu.runner import Runner
from diffpir_tpu.utils import image as im

IMG = 64


@pytest.fixture()
def tiny_testset(tmp_path):
    rng = np.random.default_rng(0)
    tdir = tmp_path / "testsets" / "tiny"
    tdir.mkdir(parents=True)
    for i in range(2):
        x = np.zeros((IMG, IMG, 3), np.float32)
        x[:, :] = rng.random(3)
        x[20:44, 20:44] = rng.random(3)
        im.imsave(im.single2uint(x), str(tdir / f"img{i}.png"))
    return tmp_path


def _cfg(tmp_path, **over):
    o = dict(task="deblur", model_name="tiny_test", testset_name="tiny",
             cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0,
             save_E=False, save_L=False, dtype="float32", noise_level_img=2.0,
             kernel_size=15)
    o.update(over)
    return load_config(None, o)


def test_motion_blur_end_to_end(tiny_testset):
    cfg = _cfg(tiny_testset, blur_mode="motion")
    assert cfg.kernel_std == 0.5  # motion intensity default (main_ddpir.py:151)
    items = prepare_images(cfg)
    # per-image distinct motion kernels, normalized
    assert not np.allclose(items[0]["kernel"], items[1]["kernel"])
    for it in items:
        assert it["kernel"].sum() == pytest.approx(1.0, rel=1e-4)
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])


def test_levin09_kernel_path(tiny_testset):
    cfg = _cfg(tiny_testset, use_DIY_kernel=False)
    items = prepare_images(cfg)
    k = load_kernel_asset("levin09", "k0")
    np.testing.assert_allclose(items[0]["kernel"], k.astype(np.float32))
    assert items[0]["kernel"].shape == (19, 19)
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])
