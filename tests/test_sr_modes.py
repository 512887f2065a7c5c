"""SR classical mode, init override, and LEH/progress artifacts."""

import os

import numpy as np
import pytest

from diffpir_tpu.config import load_config
from diffpir_tpu.data import make_batches, prepare_images
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


def _config(tmp_path, **over):
    overrides = dict(task="sr", model_name="tiny_test", testset_name="tiny",
                     cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0,
                     save_E=False, save_L=False, dtype="float32",
                     noise_level_img=2.0, sf=2)
    overrides.update(over)
    return load_config(None, overrides)


def test_classical_mode_data_prep(tiny_testset):
    cfg = _config(tiny_testset, sr_mode="classical", classical_kernel_index=1)
    items = prepare_images(cfg)
    assert items[0]["kernel"].shape == (25, 25)       # kernels_12 PSFs are 25x25
    assert items[0]["img_L"].shape == (IMG // 2, IMG // 2, 3)
    assert items[0]["init"].shape == (IMG, IMG, 3)    # shifted upscale init
    b = make_batches(items, 2)[0]
    assert b.init.shape == (2, IMG, IMG, 3)


def test_classical_mode_end_to_end(tiny_testset):
    cfg = _config(tiny_testset, sr_mode="classical")
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"])


def test_leh_and_progress_artifacts(tiny_testset):
    cfg = _config(tiny_testset, task="inpaint", sf=1, save_E=True,
                  save_LEH=True, log_process=True,
                  mask_prob_range=[0.3, 0.3])
    runner = Runner(cfg, use_mesh=False)
    runner.evaluate()
    files = os.listdir(cfg.E_path)
    assert sum(f.startswith("LEH_") for f in files) == 2
    assert sum(f.startswith("progress_") for f in files) == 2
    # progressive strips are n_slots frames wide
    from PIL import Image

    strip = Image.open(os.path.join(
        cfg.E_path, next(f for f in files if f.startswith("progress_"))))
    assert strip.size[0] > strip.size[1]  # horizontally concatenated frames
    # the final frame must be the restored output, not an unwritten zero slot
    arr = np.asarray(strip)
    assert arr[:, -IMG:, :].mean() > 1.0


def test_classical_init_uses_noisy_observation(tiny_testset):
    """The classical-SR x-init upscales the NOISY img_L — the reference adds
    AWGN (main_ddpir_sisr.py:218) before the cv2 upscale + shift (243-248).
    If the init were built pre-noise it would be identical across noise
    draws."""
    cfg = _config(tiny_testset, sr_mode="classical", classical_kernel_index=1,
                  noise_level_img=12.75)
    np.random.seed(0)
    a = prepare_images(cfg)[0]
    np.random.seed(1)
    b = prepare_images(cfg)[0]
    assert not np.allclose(a["img_L"], b["img_L"])  # different AWGN draws
    assert not np.allclose(a["init"], b["init"])    # init carries the noise
    # and the init is the shifted bicubic upscale OF that noisy observation
    import jax.numpy as jnp

    from diffpir_tpu.ops.degrade import shift_pixel
    from diffpir_tpu.ops.resize import resize2d

    up = np.asarray(resize2d(jnp.asarray(a["img_L"])[None], float(cfg.sf),
                             kernel="cubic_torch", antialiasing=False))[0]
    np.testing.assert_allclose(a["init"], shift_pixel(up, cfg.sf), atol=1e-6)


def test_batch_kernel_padding_preserves_center():
    """Mixed kernel sizes in one batch: padding keeps each center at size//2
    (psf_to_otf rolls by -(size//2)), so the padded OTF equals the original."""
    from diffpir_tpu.ops.boundary import psf2otf

    rng = np.random.default_rng(4)
    ks = [rng.random((7, 7)), rng.random((8, 8)), rng.random((5, 9))]
    ks = [(k / k.sum()).astype(np.float32) for k in ks]
    items = [dict(img_H=np.zeros((16, 16, 3), np.uint8),
                  img_L=np.zeros((16, 16, 3), np.float32),
                  kernel=k, mask=np.ones((16, 16, 3), np.float32),
                  init=None, name=f"i{j}") for j, k in enumerate(ks)]
    batch = make_batches(items, batch_size=3)[0]
    assert batch.kernel.shape[1:] == (8, 9)
    for kp, k in zip(batch.kernel, ks):
        np.testing.assert_allclose(psf2otf(kp, (16, 16)), psf2otf(k, (16, 16)),
                                   atol=1e-6)
