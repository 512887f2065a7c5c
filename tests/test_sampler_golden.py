"""End-to-end sampler parity: our lax.scan trajectory vs the reference loop.

Drives the SAME tiny UNet (weights shared through the checkpoint converter)
through (a) the reference's own functions (``utils_model.model_fn`` +
``utils_sisr.data_solution`` in a faithful transcription of the
``main_ddpir.py:341-467`` loop) and (b) our ``diffpir_tpu.sampler``.  With
eta=0, zeta=0 the trajectory is deterministic given x_init, so outputs must
agree to float32 accumulation tolerance.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guided_diffusion.script_util import create_gaussian_diffusion  # noqa: E402
from guided_diffusion.unet import UNetModel  # noqa: E402
from utils import utils_model  # noqa: E402
from utils import utils_sisr as ref_sr  # noqa: E402

from diffpir_tpu.models.convert import convert_state_dict  # noqa: E402
from diffpir_tpu.models.unet import UNet, UNetConfig  # noqa: E402
from diffpir_tpu.ops.degrade import blur_circular, fspecial_gaussian  # noqa: E402
from diffpir_tpu.ops.fft_prox import precompute  # noqa: E402
from diffpir_tpu.sampler import (  # noqa: E402
    diffpir_sample, make_denoiser, make_fft_prox, make_inpaint_prox,
)
from diffpir_tpu.schedule import NoiseSchedule, build_plan, make_seq  # noqa: E402

T = 1000
N_STEPS = 8
IMG = 16


@pytest.fixture(scope="module")
def tiny_models():
    torch_model = UNetModel(
        image_size=IMG, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=4, num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=False,
    ).eval()
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(11)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.03
    torch_model.load_state_dict(sd)
    for p in torch_model.parameters():
        p.requires_grad_(False)

    cfg = UNetConfig(image_size=IMG, model_channels=32, out_channels=6,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                     dropout=0.0, use_scale_shift_norm=True, resblock_updown=True)
    flax_model = UNet(cfg)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    return torch_model, flax_model, params


def reference_trajectory(torch_model, x_init_nchw, task, y_nchw, mask_nchw, k2d,
                         lambda_=1.0, sigma=0.05):
    """Faithful transcription of the reference DiffPIR loop
    (``main_ddpir.py:274-470``) with eta=0, zeta=0, iter_num_U=1."""
    diffusion = create_gaussian_diffusion(
        steps=T, learn_sigma=True, noise_schedule="linear")
    betas = np.linspace(0.0001, 0.02, T, dtype=np.float32)
    betas_t = torch.from_numpy(betas)
    alphas = 1.0 - betas_t
    acp = torch.from_numpy(np.cumprod(alphas.numpy(), axis=0))
    sqrt_acp = torch.sqrt(acp)
    sqrt_1m_acp = torch.sqrt(1.0 - acp)
    reduced = sqrt_1m_acp / sqrt_acp

    sigmas, rhos = [], []
    for i in range(T):
        sigmas.append(reduced[T - 1 - i])
        sigma_k = sqrt_1m_acp[i] / sqrt_acp[i]
        rhos.append(lambda_ * sigma**2 / sigma_k**2)
    rhos = torch.tensor(rhos)

    y = torch.from_numpy(y_nchw)
    x = torch.from_numpy(x_init_nchw.copy())
    if task == "deblur":
        kt = torch.from_numpy(np.broadcast_to(k2d, (1, 3) + k2d.shape).copy())
        FB, FBC, F2B, FBFy = ref_sr.pre_calculate(y, kt, 1)
    mask = None if mask_nchw is None else torch.from_numpy(mask_nchw)

    seq = make_seq(T, N_STEPS, "quad")
    with torch.no_grad():
        for i in range(len(seq)):
            curr_sigma = sigmas[seq[i]].numpy()
            t_i = utils_model.find_nearest(reduced, curr_sigma)
            x0 = utils_model.model_fn(
                x, noise_level=curr_sigma * 255, model_out_type="pred_xstart",
                model_diffusion=torch_model, diffusion=diffusion,
                ddim_sample=False, alphas_cumprod=acp)
            if seq[i] != seq[-1]:
                tau = rhos[t_i].float()
                if task == "inpaint":
                    x0_p = (mask * (2 * y - 1) + tau * x0).div(mask + tau)
                    x0 = x0 + 1.0 * (x0_p - x0)
                else:
                    x0_p = x0 / 2 + 0.5
                    x0_p = ref_sr.data_solution(x0_p.float(), FB, FBC, F2B, FBFy, tau, 1)
                    x0_p = x0_p * 2 - 1
                    x0 = x0 + 1.0 * (x0_p - x0)
                # renoise, eta=0 zeta=0 -> deterministic
                t_im1 = utils_model.find_nearest(reduced, sigmas[seq[i + 1]].numpy())
                eps = (x - sqrt_acp[t_i] * x0) / sqrt_1m_acp[t_i]
                x = sqrt_acp[t_im1] * x0 + torch.sqrt(sqrt_1m_acp[t_im1] ** 2) * eps
    return (x / 2 + 0.5).numpy()


@pytest.mark.parametrize("task", ["inpaint", "deblur"])
def test_trajectory_matches_reference(tiny_models, task):
    torch_model, flax_model, params = tiny_models
    rng = np.random.default_rng(5)

    gt = rng.random((1, IMG, IMG, 3)).astype(np.float32)
    # sigma=0.6: min|OTF|^2 ~ 1e-2, so the tiny-tau Wiener solves stay
    # well-conditioned on both sides and the comparison tests semantics, not
    # amplified fp32 FFT noise (wider kernels have |OTF|->0 and both
    # implementations diverge chaotically through trajectory feedback).
    k2d = fspecial_gaussian(5, 0.6).astype(np.float32)
    if task == "inpaint":
        mask = (rng.random((1, IMG, IMG, 1)) > 0.4).astype(np.float32)
        mask3 = np.broadcast_to(mask, gt.shape).copy()
        y = gt * mask3
    else:
        mask3 = None
        y = np.asarray(blur_circular(jnp.asarray(gt), jnp.asarray(k2d)[None]))

    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    x_init = (np.sqrt(sched.alphas_cumprod[-1]) * (2 * y - 1)
              + np.sqrt(1 - sched.alphas_cumprod[-1])
              * rng.standard_normal(y.shape)).astype(np.float32)

    ref = reference_trajectory(
        torch_model, x_init.transpose(0, 3, 1, 2), task,
        y.transpose(0, 3, 1, 2),
        None if mask3 is None else mask3.transpose(0, 3, 1, 2), k2d)

    plan = build_plan(sched, iter_num=N_STEPS, skip_type="quad",
                      lambda_=1.0, eta=0.0, sigma_y=0.05)
    den = make_denoiser(
        lambda p, x, t: flax_model.apply({"params": p}, x, t), params, sched)
    yj = jnp.asarray(y)
    if task == "inpaint":
        prox = make_inpaint_prox(yj, jnp.asarray(mask3))
        mask_arg = jnp.asarray(mask3)
    else:
        prox = make_fft_prox(precompute(yj, jnp.asarray(k2d)[None], 1))
        mask_arg = None

    out = diffpir_sample(
        den, prox, plan, jnp.asarray(x_init), jax.random.PRNGKey(0),
        zeta=0.0, generate_mode="DiffPIR", y=yj, mask=mask_arg)
    ours = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-3)


def test_sr_trajectory_matches_reference(tiny_models):
    """SR (blur mode, sf=2): full trajectory incl. the sf-split FFT solve."""
    torch_model, flax_model, params = tiny_models
    import torch.nn.functional as F

    rng = np.random.default_rng(6)
    sf = 2
    gt = rng.random((1, IMG, IMG, 3)).astype(np.float32)
    k2d = fspecial_gaussian(5, 0.6).astype(np.float32)
    # LR observation: matlab-bicubic downscale of gt (main_ddpir.py:89)
    from diffpir_tpu.ops.resize import resize2d

    y = np.asarray(resize2d(jnp.asarray(gt), 1 / sf)).astype(np.float32)

    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    # shared x_init: torch-bicubic upscale of y then diffused (main_ddpir.py:295,315)
    up = F.interpolate(torch.from_numpy(y.transpose(0, 3, 1, 2)),
                       size=(IMG, IMG), mode="bicubic",
                       align_corners=False).numpy().transpose(0, 2, 3, 1)
    noise = rng.standard_normal(up.shape).astype(np.float32)
    x_init = (np.sqrt(sched.alphas_cumprod[-1]) * (2 * up - 1)
              + np.sqrt(1 - sched.alphas_cumprod[-1]) * noise).astype(np.float32)

    # torch reference loop with the sf-split data_solution
    diffusion = create_gaussian_diffusion(steps=T, learn_sigma=True,
                                          noise_schedule="linear")
    betas = np.linspace(0.0001, 0.02, T, dtype=np.float32)
    acp = torch.from_numpy(np.cumprod(1.0 - betas, axis=0))
    sqrt_acp, sqrt_1m = torch.sqrt(acp), torch.sqrt(1.0 - acp)
    reduced = sqrt_1m / sqrt_acp
    sigmas = [reduced[T - 1 - i] for i in range(T)]
    rhos = torch.tensor([0.05**2 / (reduced[i] ** 2) for i in range(T)])
    yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
    kt = torch.from_numpy(np.broadcast_to(k2d, (1, 3) + k2d.shape).copy())
    FB, FBC, F2B, FBFy = ref_sr.pre_calculate(yt, kt, sf)
    x = torch.from_numpy(x_init.transpose(0, 3, 1, 2).copy())
    seq = make_seq(T, N_STEPS, "quad")
    with torch.no_grad():
        for i in range(len(seq)):
            curr_sigma = sigmas[seq[i]].numpy()
            t_i = utils_model.find_nearest(reduced, curr_sigma)
            x0 = utils_model.model_fn(
                x, noise_level=curr_sigma * 255, model_out_type="pred_xstart",
                model_diffusion=torch_model, diffusion=diffusion,
                ddim_sample=False, alphas_cumprod=acp)
            if seq[i] != seq[-1]:
                tau = rhos[t_i].float()
                x0_p = ref_sr.data_solution((x0 / 2 + 0.5).float(), FB, FBC,
                                            F2B, FBFy, tau, sf) * 2 - 1
                x0 = x0 + 1.0 * (x0_p - x0)
                t_im1 = utils_model.find_nearest(reduced, sigmas[seq[i + 1]].numpy())
                eps = (x - sqrt_acp[t_i] * x0) / sqrt_1m[t_i]
                x = sqrt_acp[t_im1] * x0 + sqrt_1m[t_im1] * eps
    ref = (x / 2 + 0.5).numpy()

    plan = build_plan(sched, iter_num=N_STEPS, skip_type="quad",
                      lambda_=1.0, eta=0.0, sigma_y=0.05)
    den = make_denoiser(
        lambda p, xx, t: flax_model.apply({"params": p}, xx, t), params, sched)
    prox = make_fft_prox(precompute(jnp.asarray(y), jnp.asarray(k2d)[None], sf))
    out = diffpir_sample(den, prox, plan, jnp.asarray(x_init),
                         jax.random.PRNGKey(0), zeta=0.0,
                         generate_mode="DiffPIR", y=jnp.asarray(y))
    ours = np.asarray(out).transpose(0, 3, 1, 2)
    # our sf-split solve is cancellation-free, but the reference's /tau
    # formulation amplifies ITS OWN fp32 rounding ~1/rho-fold at early steps
    # (test_fft_prox.test_sf2_stable_form_beats_reference_formula quantifies
    # it); the residual gap here is the reference's noise floor
    # a few pixels drift further as the reference's prox noise feeds back
    # through the denoiser; the mean bound is the meaningful criterion
    assert np.abs(ours - ref).mean() < 5e-3
    assert np.abs(ours - ref).max() < 0.15


def test_vanilla_mode_ignores_prox(tiny_models):
    _, flax_model, params = tiny_models
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    plan = build_plan(sched, iter_num=4, skip_type="quad", eta=0.0)
    den = make_denoiser(
        lambda p, x, t: flax_model.apply({"params": p}, x, t), params, sched)
    x_init = jnp.zeros((1, IMG, IMG, 3))
    poison = lambda x0, tau: x0 * jnp.nan  # must never be called
    out = diffpir_sample(den, poison, plan, x_init, jax.random.PRNGKey(1),
                         zeta=0.0, generate_mode="vanilla")
    assert np.isfinite(np.asarray(out)).all()


def test_deblur_ty_trajectory_matches_reference(tiny_models):
    """Noisy-deblur (sigma = 12.75/255) with the standalone deblur driver's
    t_y initialization (``main_ddpir_deblur.py:227-231``): x_init is built by
    the effective-alpha formula on BOTH sides (shared noise), then the full
    trajectory must agree as in test_trajectory_matches_reference."""
    torch_model, flax_model, params = tiny_models
    rng = np.random.default_rng(9)
    sigma = 12.75 / 255

    gt = rng.random((1, IMG, IMG, 3)).astype(np.float32)
    k2d = fspecial_gaussian(5, 0.6).astype(np.float32)
    y = np.asarray(blur_circular(jnp.asarray(gt), jnp.asarray(k2d)[None]))
    y = np.clip(y + rng.normal(0, sigma, y.shape), 0, 1).astype(np.float32)

    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    # reference t_y init transcription (torch)
    acp_t = torch.cumprod(1.0 - torch.from_numpy(
        np.linspace(0.0001, 0.02, T, dtype=np.float32)), dim=0)
    sqrt_acp_t, sqrt_1m_t = torch.sqrt(acp_t), torch.sqrt(1.0 - acp_t)
    reduced_t = sqrt_1m_t / sqrt_acp_t
    t_y = int(torch.argmin((reduced_t - 2 * sigma).abs()))
    sae = float(sqrt_acp_t[T - 1] / sqrt_acp_t[t_y])
    coef = float(torch.sqrt(sqrt_1m_t[T - 1] ** 2 - sae**2 * sqrt_1m_t[t_y] ** 2))
    noise = rng.standard_normal(y.shape).astype(np.float32)
    x_init = (sae * (2 * y - 1) + coef * noise).astype(np.float32)

    # our init_x(ty=...) reproduces the same x_init given the same noise
    from diffpir_tpu.sampler import init_x

    ty = (float(sched.sqrt_alphas_cumprod[sched.sigma_to_t(2 * sigma)]),
          float(np.sqrt(1 - sched.alphas_cumprod[sched.sigma_to_t(2 * sigma)])))
    key = jax.random.PRNGKey(4)
    ours_init = np.asarray(init_x(
        "deblur", jnp.asarray(y), None, 1,
        sqrt_acp_start=float(sched.sqrt_alphas_cumprod[-1]),
        sqrt_1m_acp_start=float(np.sqrt(1 - sched.alphas_cumprod[-1])),
        key=key, ty=ty))
    jnoise = np.asarray(jax.random.normal(key, y.shape, jnp.float32))
    np.testing.assert_allclose(
        ours_init, sae * (2 * y - 1) + coef * jnoise, rtol=1e-5, atol=1e-6)

    ref = reference_trajectory(
        torch_model, x_init.transpose(0, 3, 1, 2), "deblur",
        y.transpose(0, 3, 1, 2), None, k2d, sigma=sigma)

    plan = build_plan(sched, iter_num=N_STEPS, skip_type="quad",
                      lambda_=1.0, eta=0.0, sigma_y=sigma)
    den = make_denoiser(
        lambda p, x, t: flax_model.apply({"params": p}, x, t), params, sched)
    prox = make_fft_prox(precompute(jnp.asarray(y), jnp.asarray(k2d)[None], 1))
    out = diffpir_sample(den, prox, plan, jnp.asarray(x_init),
                         jax.random.PRNGKey(0), zeta=0.0,
                         generate_mode="DiffPIR", y=jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=5e-3, rtol=1e-3)
