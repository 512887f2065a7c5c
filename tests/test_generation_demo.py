"""Respaced generation loops driven by the trained demo prior.

Full from-noise generation needs a stronger prior than the 6M-param demo
model, so these tests run the L2 loops (p_sample_loop / ddim_sample_loop over
a respaced sub-chain) from a forward-diffused mid-chain state — which the
prior CAN denoise — and check the result returns close to the source image
(loop mechanics + respacing map + learned-variance path, end to end).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffpir_tpu.diffusion import Diffusion, ModelMeanType, ModelVarType
from diffpir_tpu.models.unet import UNet
from diffpir_tpu.models.zoo import TINY_TEST_CONFIG, load_params_npz
from diffpir_tpu.schedule import NoiseSchedule
from diffpir_tpu.utils import image as im

DEMO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "assets", "demo", "tiny_demo32.flax.npz")

if not os.path.exists(DEMO):
    pytest.skip("demo model not trained yet", allow_module_level=True)


@pytest.fixture(scope="module")
def setup():
    sys.path.insert(0, os.path.join(os.path.dirname(DEMO), "..", ".."))
    from scripts.train_demo import synth_batch

    model = UNet(TINY_TEST_CONFIG, dtype=jnp.float32)
    params = load_params_npz(DEMO)
    base = NoiseSchedule.linear(0.0001, 0.02, 1000)
    # bottom 20% of the chain, respaced to 21 steps
    keep = sorted(range(0, 201, 10))
    sub, tmap = base.respaced(keep)
    diff = Diffusion(sub, ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    tmap_dev = jnp.asarray(tmap)

    def model_fn(x, t):
        # respaced chain remaps sub-timesteps to base (respace.py:123-128)
        return model.apply({"params": params}, x, tmap_dev[t])

    gt = jnp.asarray(synth_batch(np.random.default_rng(321), 2, IMG=32))
    return diff, model_fn, gt


def _half_noised(diff, gt, key):
    T = diff.schedule.num_timesteps
    t = jnp.full((gt.shape[0],), T - 1, jnp.int32)
    return diff.q_sample(gt, t, jax.random.normal(key, gt.shape, jnp.float32))


@pytest.mark.parametrize("loop", ["ddim", "ancestral"])
def test_denoise_from_midchain_recovers_image(setup, loop):
    diff, model_fn, gt = setup
    key = jax.random.PRNGKey(0)
    x_t = _half_noised(diff, gt, key)
    psnr_noised = im.psnr_batch(np.asarray(x_t), np.asarray(gt))
    if loop == "ddim":
        out = diff.ddim_sample_loop(model_fn, gt.shape, key, noise=x_t)
    else:
        out = diff.p_sample_loop(model_fn, gt.shape, key, noise=x_t)
    s = np.asarray(out)
    assert np.isfinite(s).all()
    psnr = im.psnr_batch(s, np.asarray(gt))
    print(f"{loop}: noised {psnr_noised:.2f} dB -> denoised {psnr:.2f} dB")
    assert psnr > psnr_noised + 5.0
    assert psnr > 15.0
