"""Gradient-based guidance modes: DPS and first-order data-fidelity steps.

Parity targets in the reference:
  * ``grad_and_value``  (``utils/utils_model.py:390-394``): norm is the
    FROBENIUS norm over the whole batch tensor (a single scalar coupling all
    batch elements — reproduced faithfully).
  * first-order (non-analytic) DiffPIR prox, ``sub_1_analytic: false``
    (``main_ddpir.py:420-429``): x0 <- x0 - grad * ||r|| / rho, gradient taken
    w.r.t. x0 itself (not through the denoiser).
  * DPS_y0 (``main_ddpir.py:431-437``): x <- x_prev - d||y - H(x0(x))||/dx,
    differentiated THROUGH the denoiser (+ p_sample machinery).
  * DPS_yt (``main_ddpir.py:438-445``): gradient w.r.t. x_prev of
    ||y_t - H(x_prev)|| with a freshly forward-diffused y_t; no grad through
    the model; step scale lambda * ||r|| / rho * 0.35.

Degradation operators H (``main_ddpir.py:293-310``): deblur = [0,1]-domain
reflection-pad depthwise blur; SR = MATLAB-cubic 1/sf downscale applied in
[-1,1].  JAX autodiff replaces torch.autograd; the whole DPS trajectory is
still a single ``lax.scan``.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from diffpir_tpu.diffusion import Diffusion
from diffpir_tpu.ops.degrade import blur_reflect
from diffpir_tpu.ops.resize import Resizer2D
from diffpir_tpu.schedule import TrajectoryPlan

__all__ = ["make_degrade_op", "make_grad_prox", "dps_sample", "frobenius_residual"]


def make_degrade_op(task: str, *, kernel: Optional[jnp.ndarray] = None,
                    hr_hw: Optional[tuple[int, int]] = None,
                    sf: int = 1) -> Callable:
    """H for gradient guidance (domain conventions of ``main_ddpir.py:293-310``).

    deblur: x in [-1,1] -> blur(x/2+0.5) in [0,1] (compare against y).
    sr:     x in [-1,1] -> cubic downscale (compare against 2y-1).
    """
    if task == "deblur":
        def op(x):
            return blur_reflect(x * 0.5 + 0.5, kernel)
        return op
    if task == "sr":
        down = Resizer2D(hr_hw, 1.0 / sf)
        return down
    raise ValueError(f"no gradient degrade op for task {task!r} "
                     "(the reference has no first-order inpainting either)")


def frobenius_residual(operator: Callable, x_hat: jnp.ndarray,
                       measurement: jnp.ndarray) -> jnp.ndarray:
    """||measurement - H(x_hat)||_F over the entire batch tensor."""
    diff = measurement - operator(x_hat)
    return jnp.sqrt(jnp.sum(diff.astype(jnp.float32) ** 2))


def make_grad_prox(operator: Callable, measurement: jnp.ndarray) -> Callable:
    """First-order replacement for the analytic prox (sub_1_analytic=false)."""

    def prox(x0: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
        norm, grad = jax.value_and_grad(
            lambda v: frobenius_residual(operator, v, measurement))(x0)
        return x0 - grad * norm / tau

    return prox


def dps_sample(
    diffusion: Diffusion,
    model_fn: Callable,
    operator: Callable,
    plan: TrajectoryPlan,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    mode: str,                       # 'DPS_y0' | 'DPS_yt'
    task: str,
    y: jnp.ndarray,
    lambda_: float = 1.0,
) -> jnp.ndarray:
    """DPS trajectory as one lax.scan; returns restored image in [0, 1].

    Mirrors the reference control flow: per kept step, one ancestral
    ``p_sample`` producing (x_prev, x0_hat), then the mode's gradient
    correction; the final step's model call is discarded exactly as in
    DiffPIR mode (``main_ddpir.py:372,384,448``).
    """
    t_tab = jnp.asarray(plan.t)
    rho_tab = jnp.asarray(plan.rho)
    sa_tab = jnp.asarray(plan.sqrt_acp_t)
    s1m_tab = jnp.asarray(plan.sqrt_1m_acp_t)
    n = plan.n_steps
    measurement_static = y if task == "deblur" else 2.0 * y - 1.0
    # lambda may be per-sample (B,): the plan is then built with lambda=1 and
    # rho scaled in-graph.  As in the reference, lambda cancels against the
    # rho it was built into (config.lambda_ is mutated before test_rho,
    # main_ddpir.py:443) — the per-sample form keeps that exact structure.
    lam = jnp.asarray(lambda_, jnp.float32)
    per_sample = lam.ndim == 1
    lam_b = lam.reshape(-1, 1, 1, 1) if per_sample else lam

    def p_sample_pair(x, t, k):
        b = x.shape[0]
        t_vec = jnp.full((b,), t, jnp.int32)
        out = diffusion.p_sample(model_fn, x, t_vec, k)
        return out["sample"], out["pred_xstart"]

    def step(carry, i):
        x = carry
        t, rho = t_tab[i], rho_tab[i]
        k_samp, k_yt = jax.random.split(jax.random.fold_in(key, i))

        if mode == "DPS_y0":
            def norm_of(xv):
                xt, x0 = p_sample_pair(xv, t, k_samp)
                return frobenius_residual(operator, x0, measurement_static), xt

            (norm, xt), grad = jax.value_and_grad(norm_of, has_aux=True)(x)
            x = xt - grad * 1.0
        else:  # DPS_yt
            xt, _ = p_sample_pair(x, t, k_samp)
            y_t = (sa_tab[i] * (2.0 * y - 1.0)
                   + s1m_tab[i] * jax.random.normal(k_yt, y.shape, jnp.float32))
            meas = y_t * 0.5 + 0.5 if task == "deblur" else y_t
            norm, grad = jax.value_and_grad(
                lambda v: frobenius_residual(operator, v, meas))(xt)
            rho_eff = rho * lam_b if per_sample else rho
            x = xt - grad * lam_b * norm / rho_eff * 0.35
        return x, None

    x, _ = jax.lax.scan(step, x_init, jnp.arange(n - 1))
    return x * 0.5 + 0.5
