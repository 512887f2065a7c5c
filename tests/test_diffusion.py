"""Diffusion process (q/p/ddim/vlb/training losses) vs the torch reference."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guided_diffusion import gaussian_diffusion as gd  # noqa: E402
from guided_diffusion.respace import SpacedDiffusion  # noqa: E402

from diffpir_tpu.diffusion import (  # noqa: E402
    Diffusion, ModelMeanType, ModelVarType, discretized_gaussian_log_likelihood,
    normal_kl,
)
from diffpir_tpu.schedule import NoiseSchedule  # noqa: E402

T = 100


@pytest.fixture(scope="module")
def pair():
    sched = NoiseSchedule.named("linear", T)
    ref = gd.GaussianDiffusion(
        betas=sched.betas, model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.LEARNED_RANGE, loss_type=gd.LossType.MSE)
    ours = Diffusion(sched, ModelMeanType.EPSILON, ModelVarType.LEARNED_RANGE)
    return ref, ours


def _fake_model_np(x_nchw, t):
    """Deterministic pseudo-model: eps = tanh(rolled x), var raw = sin(x)."""
    eps = np.tanh(np.roll(x_nchw, 1, axis=-1))
    var = np.sin(x_nchw)
    return np.concatenate([eps, var], axis=1)


def _inputs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 3, 8, 8)).astype(np.float32)
    t = np.array([0, 3, 50, 99])
    return x, t


def test_q_sample_and_posterior(pair):
    ref, ours = pair
    x, t = _inputs()
    noise = np.random.default_rng(1).standard_normal(x.shape).astype(np.float32)
    r = ref.q_sample(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(noise)).numpy()
    o = ours.q_sample(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                      jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2), r, atol=1e-5)


def test_p_mean_variance_learned_range(pair):
    ref, ours = pair
    x, t = _inputs()
    out_np = _fake_model_np(x, t)

    r = ref.p_mean_variance(
        lambda xt, tt: torch.from_numpy(out_np), torch.from_numpy(x),
        torch.from_numpy(t), clip_denoised=True)
    o = ours.p_mean_variance(
        None, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        clip_denoised=True,
        model_output=jnp.asarray(out_np.transpose(0, 2, 3, 1)))
    for k_ref, k_ours in [("mean", "mean"), ("log_variance", "log_variance"),
                          ("pred_xstart", "pred_xstart")]:
        np.testing.assert_allclose(
            np.asarray(o[k_ours]).transpose(0, 3, 1, 2), r[k_ref].numpy(),
            atol=2e-5, err_msg=k_ref)


def test_vb_terms_match(pair):
    ref, ours = pair
    x, t = _inputs()
    x0 = np.clip(x, -1, 1)
    out_np = _fake_model_np(x, t)
    r = ref._vb_terms_bpd(
        lambda xt, tt: torch.from_numpy(out_np), torch.from_numpy(x0),
        torch.from_numpy(x), torch.from_numpy(t), clip_denoised=False)
    o = ours.vb_terms(None, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                      jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
                      model_output=jnp.asarray(out_np.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(o), r["output"].numpy(), atol=1e-4)


def test_training_losses_match(pair):
    ref, ours = pair
    x, t = _inputs()
    x0 = np.clip(x, -1, 1)
    noise = np.random.default_rng(2).standard_normal(x.shape).astype(np.float32)

    r = ref.training_losses(
        lambda xt, tt: torch.from_numpy(
            _fake_model_np(xt.numpy(), tt.numpy())).float(),
        torch.from_numpy(x0), torch.from_numpy(t), noise=torch.from_numpy(noise))

    def model_fn(xt, tt):
        out = _fake_model_np(np.asarray(xt).transpose(0, 3, 1, 2), np.asarray(tt))
        return jnp.asarray(out.transpose(0, 2, 3, 1))

    o = ours.training_losses(model_fn, jnp.asarray(x0.transpose(0, 2, 3, 1)),
                             jnp.asarray(t), jax.random.PRNGKey(0),
                             noise=jnp.asarray(noise.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(o["mse"]), r["mse"].numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o["vb"]), r["vb"].numpy(), atol=1e-4)


def test_kl_and_discretized_ll_formulas():
    add_reference_to_path()
    from guided_diffusion import losses as ref_losses

    rng = np.random.default_rng(3)
    a, b = rng.standard_normal((2, 16)).astype(np.float32)
    la, lb = rng.standard_normal((2, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(normal_kl(jnp.asarray(a), jnp.asarray(la), jnp.asarray(b),
                             jnp.asarray(lb))),
        ref_losses.normal_kl(torch.from_numpy(a), torch.from_numpy(la),
                             torch.from_numpy(b), torch.from_numpy(lb)).numpy(),
        rtol=1e-5, atol=1e-5)
    x = np.clip(rng.standard_normal(16), -1, 1).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(discretized_gaussian_log_likelihood(
            jnp.asarray(x), means=jnp.asarray(a), log_scales=jnp.asarray(la))),
        ref_losses.discretized_gaussian_log_likelihood(
            torch.from_numpy(x), means=torch.from_numpy(a),
            log_scales=torch.from_numpy(la)).numpy(),
        rtol=1e-5, atol=1e-5)


def test_ddim_deterministic_matches(pair):
    ref, ours = pair
    x, t = _inputs()
    t = np.array([5, 20, 60, 99])  # avoid t=0 noise-gate asymmetry
    out_np = _fake_model_np(x, t)
    r = ref.ddim_sample(lambda xt, tt: torch.from_numpy(out_np),
                        torch.from_numpy(x), torch.from_numpy(t), eta=0.0)
    # eta=0 -> deterministic; wrap model_output through p_mean_variance path
    o = ours.ddim_sample(
        lambda xt, tt: jnp.asarray(out_np.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        jax.random.PRNGKey(0), eta=0.0)
    np.testing.assert_allclose(np.asarray(o["sample"]).transpose(0, 3, 1, 2),
                               r["sample"].numpy(), atol=2e-5)


def test_ddim_reverse_matches_reference(pair):
    ref, ours = pair
    x, _ = _inputs()
    t = np.array([5, 20, 60, 98])
    out_np = _fake_model_np(x, t)
    r = ref.ddim_reverse_sample(lambda xt, tt: torch.from_numpy(out_np),
                                torch.from_numpy(x), torch.from_numpy(t))
    o = ours.ddim_reverse_sample(
        lambda xt, tt: jnp.asarray(out_np.transpose(0, 2, 3, 1)),
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(o["sample"]).transpose(0, 3, 1, 2),
                               r["sample"].numpy(), atol=2e-5)


def test_bpd_loop_matches_reference(pair):
    ref, ours = pair
    rng = np.random.default_rng(9)
    x0 = np.clip(rng.standard_normal((2, 3, 8, 8)), -1, 1).astype(np.float32)
    # prior term is noise-free and must match exactly
    r_prior = ref._prior_bpd(torch.from_numpy(x0)).numpy()
    o_prior = np.asarray(ours.prior_bpd(jnp.asarray(x0.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(o_prior, r_prior, rtol=1e-4, atol=1e-5)
    # full loop: deterministic model, different noise streams -> check shape
    # and that totals are finite and >= prior
    out = ours.calc_bpd_loop(
        lambda xt, tt: jnp.concatenate([jnp.tanh(xt), jnp.sin(xt)], axis=-1),
        jnp.asarray(x0.transpose(0, 2, 3, 1)), jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, T)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert (np.asarray(out["total_bpd"]) >= np.asarray(out["prior_bpd"])).all()


def test_respaced_sampling_tables():
    """SpacedDiffusion == Diffusion over the respaced schedule."""
    sched = NoiseSchedule.named("linear", T)
    use = sorted({0, 10, 35, 70, 99})
    ref = SpacedDiffusion(
        use_timesteps=use, betas=sched.betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL, loss_type=gd.LossType.MSE)
    sub, tmap = sched.respaced(use)
    ours = Diffusion(sub, ModelMeanType.EPSILON, ModelVarType.FIXED_SMALL)
    np.testing.assert_allclose(ours.schedule.alphas_cumprod, ref.alphas_cumprod,
                               rtol=1e-10)
    np.testing.assert_array_equal(tmap, ref.timestep_map)


def test_condition_mean_matches_reference(pair):
    """Classifier guidance mean shift (gaussian_diffusion.py:356-372)."""
    ref, ours = pair
    x, t = _inputs()
    out_np = _fake_model_np(x, t)
    grad_np = (0.1 * np.cos(x)).astype(np.float32)  # fake grad log p(y|x)

    r_pmv = ref.p_mean_variance(lambda xt, tt: torch.from_numpy(out_np),
                                torch.from_numpy(x), torch.from_numpy(t),
                                clip_denoised=True)
    r_mean = ref.condition_mean(
        lambda xt, tt, **kw: torch.from_numpy(grad_np), r_pmv,
        torch.from_numpy(x), torch.from_numpy(t), model_kwargs={})

    o_pmv = ours.p_mean_variance(
        None, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        clip_denoised=True,
        model_output=jnp.asarray(out_np.transpose(0, 2, 3, 1)))
    o_mean = ours.condition_mean(
        lambda xt, tt: jnp.asarray(grad_np.transpose(0, 2, 3, 1)),
        o_pmv, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(o_mean).transpose(0, 3, 1, 2),
                               r_mean.numpy(), atol=2e-5)


def test_condition_score_matches_reference(pair):
    """Score-based conditioning for DDIM (gaussian_diffusion.py:374-393)."""
    ref, ours = pair
    x, t = _inputs()
    out_np = _fake_model_np(x, t)
    grad_np = (0.1 * np.cos(x)).astype(np.float32)

    r_pmv = ref.p_mean_variance(lambda xt, tt: torch.from_numpy(out_np),
                                torch.from_numpy(x), torch.from_numpy(t),
                                clip_denoised=True)
    r_out = ref.condition_score(
        lambda xt, tt, **kw: torch.from_numpy(grad_np), r_pmv,
        torch.from_numpy(x), torch.from_numpy(t), model_kwargs={})

    o_pmv = ours.p_mean_variance(
        None, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t),
        clip_denoised=True,
        model_output=jnp.asarray(out_np.transpose(0, 2, 3, 1)))
    o_out = ours.condition_score(
        lambda xt, tt: jnp.asarray(grad_np.transpose(0, 2, 3, 1)),
        o_pmv, jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(t))
    for k in ("mean", "pred_xstart"):
        np.testing.assert_allclose(np.asarray(o_out[k]).transpose(0, 3, 1, 2),
                                   r_out[k].numpy(), atol=2e-5, err_msg=k)


def test_classifier_guided_sampling_e2e(pair):
    """Classifier guidance composes end to end: a (random) EncoderUNet
    classifier's grad log p(y|x) drives p_sample via cond_fn and measurably
    shifts the trajectory (reference classifier-guidance wiring,
    script_util.py classifier factories + condition_mean)."""
    _, ours = pair
    from diffpir_tpu.models.unet import UNetConfig
    from diffpir_tpu.models.variants import EncoderUNet

    ecfg = UNetConfig(image_size=8, model_channels=32, out_channels=5,
                      num_res_blocks=1, attention_resolutions=(2,),
                      channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                      dropout=0.0)
    clf = EncoderUNet(ecfg, pool="attention")
    x0 = jnp.zeros((2, 8, 8, 3))
    cparams = clf.init(jax.random.PRNGKey(1), x0, jnp.zeros((2,), jnp.int32))["params"]
    y = jnp.array([1, 3])

    def cond_fn(xt, tt, scale=10.0):
        def logp(v):
            logits = clf.apply({"params": cparams}, v, tt)
            lp = jax.nn.log_softmax(logits, axis=-1)
            return lp[jnp.arange(v.shape[0]), y].sum()
        return scale * jax.grad(logp)(xt)

    out_np = None  # deterministic fake denoiser, same for both runs
    model_fn = lambda xt, tt: jnp.concatenate(
        [jnp.tanh(xt), jnp.sin(xt)], axis=-1)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3), jnp.float32)
    key = jax.random.PRNGKey(3)
    t = jnp.full((2,), 50, jnp.int32)
    guided = ours.p_sample(model_fn, x, t, key, cond_fn=cond_fn)["sample"]
    unguided = ours.p_sample(model_fn, x, t, key)["sample"]
    assert np.isfinite(np.asarray(guided)).all()
    assert not np.allclose(np.asarray(guided), np.asarray(unguided))
