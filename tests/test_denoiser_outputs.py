"""Denoiser output-type conversions (epsilon/score) vs closed-form identities."""

import numpy as np

import jax.numpy as jnp

from diffpir_tpu.sampler import DenoiserState, denoise_output, denoise_x0
from diffpir_tpu.schedule import NoiseSchedule


def _den(sched):
    # fake model: eps-head = tanh(x), variance half = zeros
    def apply_fn(params, x, t):
        return jnp.concatenate([jnp.tanh(x), jnp.zeros_like(x)], axis=-1)

    return DenoiserState(
        apply_fn=apply_fn, params=None,
        sqrt_recip_acp=jnp.asarray(sched.sqrt_recip_alphas_cumprod, jnp.float32),
        sqrt_recipm1_acp=jnp.asarray(sched.sqrt_recipm1_alphas_cumprod, jnp.float32))


def test_epsilon_and_score_identities():
    sched = NoiseSchedule.linear(0.0001, 0.02, 100)
    den = _den(sched)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    t = 42
    x0 = denoise_x0(den, x, t)
    eps = denoise_output(den, x, t, "epsilon")
    score = denoise_output(den, x, t, "score")

    sa = np.sqrt(sched.alphas_cumprod[t])
    s1m = np.sqrt(1 - sched.alphas_cumprod[t])
    # x = sa*x0 + s1m*eps must hold by construction
    np.testing.assert_allclose(np.asarray(sa * x0 + s1m * eps), np.asarray(x),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(score), np.asarray(-eps / s1m),
                               atol=1e-5)
    # when the model's eps keeps x0 inside [-1,1], eps passes through the clamp
    small_x = x * 0.01
    eps2 = denoise_output(den, small_x, t, "epsilon")
    x02 = denoise_x0(den, small_x, t)
    assert np.abs(np.asarray(x02)).max() < 1.0
