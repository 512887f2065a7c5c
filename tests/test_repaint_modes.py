"""repaint mode and iter_num_U inner loop: end-to-end smoke + statistics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffpir_tpu.config import load_config
from diffpir_tpu.runner import Runner
from diffpir_tpu.sampler import diffpir_sample, make_denoiser, make_inpaint_prox
from diffpir_tpu.schedule import NoiseSchedule, build_plan
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
    o = dict(task="inpaint", model_name="tiny_test", testset_name="tiny",
             cwd=str(tmp_path), iter_num=3, batch_size=2, seed=0,
             save_E=False, save_L=False, dtype="float32", noise_level_img=0,
             mask_prob_range=[0.3, 0.3])
    o.update(over)
    return load_config(None, o)


def test_repaint_mode_end_to_end(tiny_testset):
    # repaint conditions only via known-pixel injection (no prox,
    # main_ddpir.py:384-386); recover_known is the extension that makes known
    # pixels exact in the output
    cfg = _cfg(tiny_testset, generate_mode="repaint", iter_num_U=2,
               recover_known=True)
    runner = Runner(cfg, use_mesh=False)
    res = runner.evaluate(save=False)
    assert np.isfinite(res["psnr"]) and res["psnr"] > 8.0


def test_iter_num_u_changes_trajectory():
    """The inner re-noise loop must actually alter the outcome (and stay sane)."""
    sched = NoiseSchedule.linear(0.0001, 0.02, 1000)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    mask = jnp.asarray((rng.random((1, 16, 16, 1)) > 0.4).astype(np.float32))

    def apply_fn(params, x, t):
        return jnp.concatenate([jnp.tanh(x) * 0.1, jnp.zeros_like(x)], axis=-1)

    den = make_denoiser(apply_fn, None, sched)
    plan = build_plan(sched, iter_num=4, skip_type="quad", sigma_y=0.05)
    prox = make_inpaint_prox(y, mask)
    x0 = jnp.zeros((1, 16, 16, 3))
    outs = {}
    for u in (1, 2):
        outs[u] = np.asarray(diffpir_sample(
            den, prox, plan, x0, jax.random.PRNGKey(0), zeta=0.5,
            iter_num_U=u, generate_mode="DiffPIR", y=y, mask=mask))
        assert np.isfinite(outs[u]).all()
    assert not np.allclose(outs[1], outs[2])
