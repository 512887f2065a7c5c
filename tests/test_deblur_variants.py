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


# ---------------------------------------------------------------------------
# t_y initialization (reference main_ddpir_deblur.py:227-231)
# ---------------------------------------------------------------------------

def test_ty_init_matches_torch_reference_formula():
    """init_x(ty=...) == the reference deblur driver's effective-alpha init,
    golden vs a literal torch transcription at sigma = 12.75/255."""
    import jax
    import jax.numpy as jnp
    import torch

    from diffpir_tpu.sampler import init_x
    from diffpir_tpu.schedule import NoiseSchedule

    T, noise_level_img = 1000, 12.75 / 255
    sched = NoiseSchedule.linear(0.0001, 0.02, T)

    # --- torch transcription (main_ddpir_deblur.py:95-100, 227-231) ---
    betas = torch.from_numpy(np.linspace(0.0001, 0.02, T, dtype=np.float32))
    acp = torch.cumprod(1.0 - betas, dim=0)
    sqrt_acp, sqrt_1m = torch.sqrt(acp), torch.sqrt(1.0 - acp)
    reduced = sqrt_1m / sqrt_acp
    t_start = T - 1
    t_y = int(torch.argmin((reduced - 2 * noise_level_img).abs()))
    sae_ref = sqrt_acp[t_start] / sqrt_acp[t_y]
    coef_ref = torch.sqrt(sqrt_1m[t_start] ** 2 - sae_ref**2 * sqrt_1m[t_y] ** 2)
    assert t_y > 0  # at this sigma the branch is actually active

    # --- ours ---
    t_y_ours = sched.sigma_to_t(2 * noise_level_img)
    assert t_y_ours == t_y
    ty = (float(sched.sqrt_alphas_cumprod[t_y_ours]),
          float(np.sqrt(1 - sched.alphas_cumprod[t_y_ours])))
    sa0 = float(sched.sqrt_alphas_cumprod[t_start])
    s1m0 = float(np.sqrt(1 - sched.alphas_cumprod[t_start]))

    rng = np.random.default_rng(0)
    # keep |2y-1| >= 0.5 so the sae extraction below divides by O(1) values
    y = jnp.asarray((0.75 + 0.25 * rng.random((1, 8, 8, 3))).astype(np.float32))
    key = jax.random.PRNGKey(3)
    kw = dict(sqrt_acp_start=sa0, sqrt_1m_acp_start=s1m0, key=key, ty=ty)
    x = np.asarray(init_x("deblur", y, None, 1, **kw))
    x_mid = np.asarray(init_x("deblur", jnp.full_like(y, 0.5), None, 1, **kw))

    # same key => same noise draw; x_mid isolates coef*noise (2*0.5-1 = 0)
    # fp32 torch cumprod vs our fp64 schedule: small relative drift expected
    sae_ours = (x - x_mid) / np.asarray(2.0 * y - 1.0)
    np.testing.assert_allclose(sae_ours, float(sae_ref), rtol=2e-4)
    noise = np.asarray(jax.random.normal(key, y.shape, jnp.float32))
    np.testing.assert_allclose(x_mid, float(coef_ref) * noise, rtol=2e-4, atol=1e-6)
    # full formula
    np.testing.assert_allclose(
        x, float(sae_ref) * np.asarray(2 * y - 1) + float(coef_ref) * noise,
        rtol=2e-4, atol=1e-5)


def test_runner_uses_ty_init_by_default(tiny_testset):
    """Default noisy-deblur config wires the t_y init; knob can disable it."""
    cfg = _cfg(tiny_testset, noise_level_img=12.75)
    runner = Runner(cfg, use_mesh=False)
    assert runner.ty_scale is not None
    t_y = runner.schedule.sigma_to_t(2 * cfg.noise_level_img)
    assert t_y > 0
    np.testing.assert_allclose(
        runner.ty_scale,
        (float(runner.schedule.sqrt_alphas_cumprod[t_y]),
         float(np.sqrt(1 - runner.schedule.alphas_cumprod[t_y]))))

    off = Runner(_cfg(tiny_testset, noise_level_img=12.75, ty_init=False),
                 use_mesh=False)
    assert off.ty_scale is None
    # non-deblur tasks never use it
    inp = Runner(load_config(None, dict(
        task="inpaint", model_name="tiny_test", testset_name="tiny",
        cwd=str(tiny_testset), iter_num=2, batch_size=2, seed=0,
        save_E=False, save_L=False, dtype="float32")), use_mesh=False)
    assert inp.ty_scale is None


def test_noisy_deblur_e2e_with_ty_init(tiny_testset):
    cfg = _cfg(tiny_testset, noise_level_img=12.75, iter_num=3)
    res = Runner(cfg, use_mesh=False).evaluate(save=False)
    assert np.isfinite(res["psnr"])


def test_kernel_viz_saved_with_artifacts(tiny_testset):
    """Deblur eval saves the reference's per-image kernel visualization
    (main_ddpir_deblur.py:177)."""
    import os

    cfg = _cfg(tiny_testset, save_E=True, iter_num=2)
    Runner(cfg, use_mesh=False).evaluate()
    files = os.listdir(cfg.E_path)
    assert sum(f.startswith("motion_kernel_") for f in files) == 2
