"""Schedule math vs closed form and vs the PyTorch reference implementation."""

import numpy as np
import pytest

from diffpir_tpu.schedule import (
    NoiseSchedule, build_plan, find_nearest, make_seq, space_timesteps,
)
from tests.conftest import add_reference_to_path, reference_available


def test_linear_schedule_closed_form():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    assert s.num_timesteps == 1000
    assert s.betas[0] == pytest.approx(0.0001)
    assert s.betas[-1] == pytest.approx(0.02)
    # cumulative products and identities
    np.testing.assert_allclose(s.alphas_cumprod, np.cumprod(1 - s.betas))
    np.testing.assert_allclose(
        s.reduced_alpha_cumprod,
        np.sqrt(1 - s.alphas_cumprod) / np.sqrt(s.alphas_cumprod),
    )
    np.testing.assert_allclose(
        s.sqrt_recipm1_alphas_cumprod, s.reduced_alpha_cumprod / 1.0, rtol=1e-12
    )
    # posterior variance telescoping: beta_t*(1-acp_{t-1})/(1-acp_t)
    t = 500
    expected = s.betas[t] * (1 - s.alphas_cumprod[t - 1]) / (1 - s.alphas_cumprod[t])
    assert s.posterior_variance[t] == pytest.approx(expected)


def test_named_matches_reference_schedules():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from guided_diffusion.gaussian_diffusion import get_named_beta_schedule

    for name in ("linear", "cosine"):
        ref = get_named_beta_schedule(name, 1000)
        ours = NoiseSchedule.named(name, 1000).betas
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_respacing_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from guided_diffusion.respace import SpacedDiffusion, space_timesteps as ref_space
    from guided_diffusion import gaussian_diffusion as gd

    T = 100
    use = space_timesteps(T, "ddim10")
    assert use == ref_space(T, "ddim10")
    assert space_timesteps(T, "25,25") == ref_space(T, "25,25")

    betas = NoiseSchedule.named("linear", T).betas
    ref_diff = SpacedDiffusion(
        use_timesteps=use, betas=betas,
        model_mean_type=gd.ModelMeanType.EPSILON,
        model_var_type=gd.ModelVarType.FIXED_SMALL,
        loss_type=gd.LossType.MSE,
    )
    ours, tmap = NoiseSchedule(betas).respaced(sorted(use))
    np.testing.assert_allclose(ours.betas, ref_diff.betas, rtol=1e-12)
    np.testing.assert_array_equal(tmap, np.array(ref_diff.timestep_map))


def test_find_nearest_tie_breaks_low():
    table = np.array([0.0, 1.0, 2.0])
    assert find_nearest(table, 0.5) == 0  # tie -> first index (argmin semantics)
    assert find_nearest(table, 1.6) == 2
    assert find_nearest(table, -5) == 0


def test_sigma_to_t_roundtrip():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    red = s.reduced_alpha_cumprod
    for t in [0, 1, 13, 500, 999]:
        assert s.sigma_to_t(red[t]) == t


def test_make_seq_reference_formulas():
    # quad: sqrt(linspace(0, T^2, N)) floored, last -=1  (main_ddpir.py:332-335)
    T, N = 1000, 20
    seq = make_seq(T, N, "quad")
    expect = [int(x) for x in np.sqrt(np.linspace(0, T**2, N))]
    expect[-1] -= 1
    assert seq == expect
    # uniform: i*skip plus appended T-1 when skip>1  (main_ddpir.py:328-331)
    sequ = make_seq(T, 100, "uniform")
    assert sequ[:3] == [0, 10, 20] and sequ[-1] == 999 and len(sequ) == 101


def test_build_plan_tables():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    plan = build_plan(s, iter_num=20, skip_type="quad", lambda_=1.0,
                      eta=0.0, sigma_y=0.05)
    assert plan.n_steps == 20
    # t descending, starting at T-1 (seq quad starts at 0 -> t = 999)
    assert plan.t[0] == 999 and np.all(np.diff(plan.t) < 0)
    # last step: no renoise, no prox
    assert not plan.renoise[-1] and not plan.prox[-1]
    assert plan.renoise[:-1].all() and plan.prox[:-1].all()
    # rho = lambda*sigma^2/sigma_bar^2 at each t
    sigma_bar = s.reduced_alpha_cumprod[plan.t]
    np.testing.assert_allclose(plan.rho, (0.05**2) / sigma_bar**2, rtol=1e-6)
    # t_prev chain: t_prev[i] == t[i+1]
    np.testing.assert_array_equal(plan.t_prev[:-1], plan.t[1:])
    # eta=0 -> eta_sigma all zero
    assert np.all(plan.eta_sigma == 0)


def test_build_plan_t_start_drops_high_noise_steps():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    t_start = s.sigma_to_t(2 * 50 / 255.0)
    plan = build_plan(s, iter_num=20, skip_type="quad", t_start=t_start)
    assert plan.t[0] <= t_start
    assert plan.n_steps < 20


def test_build_plan_eta_sigma_formula():
    s = NoiseSchedule.linear(0.0001, 0.02, 1000)
    plan = build_plan(s, iter_num=10, skip_type="quad", eta=0.85)
    i = 3
    t, tp = plan.t[i], plan.t_prev[i]
    expect = (0.85 * np.sqrt(1 - s.alphas_cumprod[tp]) /
              np.sqrt(1 - s.alphas_cumprod[t]) * np.sqrt(s.betas[t]))
    assert plan.eta_sigma[i] == pytest.approx(expect, rel=1e-6)
