"""Hyperparameter sweep for the demo-prior deblur setting (CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.models.unet import UNet
from diffpir_tpu.models.zoo import TINY_TEST_CONFIG, load_params_npz
from diffpir_tpu.ops.degrade import blur_circular, fspecial_gaussian
from diffpir_tpu.ops.fft_prox import precompute
from diffpir_tpu.sampler import diffpir_sample, init_x, make_denoiser, make_fft_prox
from diffpir_tpu.schedule import NoiseSchedule, build_plan
from diffpir_tpu.utils import image as im
from scripts.train_demo import synth_batch

model = UNet(TINY_TEST_CONFIG, dtype=jnp.float32)
params = load_params_npz("assets/demo/tiny_demo32.flax.npz")
sched = NoiseSchedule.linear(0.0001, 0.02, 1000)
den = make_denoiser(lambda p, x, t: model.apply({"params": p}, x, t), params, sched)
gt = jnp.asarray(synth_batch(np.random.default_rng(123), 2, IMG=32))

for ks, sig_k in ((7, 0.8), (9, 1.5)):
    k = fspecial_gaussian(ks, sig_k).astype(np.float32)
    y01 = blur_circular(gt * 0.5 + 0.5, jnp.asarray(k)[None])
    y01 = y01 + 0.05 * jax.random.normal(jax.random.PRNGKey(7), y01.shape)
    base = im.psnr_batch(np.asarray(y01 * 2 - 1), np.asarray(gt))
    for lam, zeta, gs in ((7.0, 0.3, 1.0), (20.0, 0.3, 1.0), (7.0, 0.3, 0.5),
                          (50.0, 0.5, 1.0)):
        plan = build_plan(sched, iter_num=20, skip_type="quad", lambda_=lam,
                          eta=0.0, sigma_y=0.05)
        prox = make_fft_prox(precompute(
            y01, jnp.asarray(np.broadcast_to(k, (2, ks, ks)).copy()), 1),
            guidance_scale=gs)
        x0 = init_x("deblur", y01, None, 1,
                    sqrt_acp_start=float(sched.sqrt_alphas_cumprod[-1]),
                    sqrt_1m_acp_start=float(np.sqrt(1 - sched.alphas_cumprod[-1])),
                    key=jax.random.PRNGKey(1))
        out = diffpir_sample(den, prox, plan, x0, jax.random.PRNGKey(1),
                             zeta=zeta, generate_mode="DiffPIR", y=y01)
        p = im.psnr_batch(np.asarray(out) * 2 - 1, np.asarray(gt))
        print(f"k{ks}/s{sig_k} lam={lam} zeta={zeta} gs={gs}: "
              f"{base:.2f} -> {p:.2f} dB", flush=True)
