"""The DiffPIR sampling trajectory as a single compiled ``jax.lax.scan``.

Algorithmic parity with the reference hot loop (``main_ddpir.py:341-467``):
per step, (1) one reverse-diffusion denoise estimating x0 from x_t
(``utils/utils_model.py:207-258`` 'pred_xstart' path), (2) a task-specific
data-fidelity proximal update blended with ``guidance_scale``
(``main_ddpir.py:384-445``), (3) a DDIM-like stochastic re-noising to
x_{t-1} controlled by (eta, zeta) (``main_ddpir.py:448-456``), with the
optional repaint-style inner loop ``iter_num_U`` (``main_ddpir.py:349-358,
462-467``).

TPU-first design decisions:
  * The whole trajectory is ONE jitted ``lax.scan`` over host-precomputed
    per-step tables (``schedule.TrajectoryPlan``) — no per-step host syncs
    (the reference does `.cpu().numpy()` + ``find_nearest`` every step,
    ``main_ddpir.py:342-344``).
  * The reference's FINAL denoiser call is provably discarded in
    'pred_xstart' modes (its x0 is never consumed: no prox on the last seq
    element, no renoise, and the output image is the carried x —
    ``main_ddpir.py:384,448,470``).  The scan therefore runs n_steps-1 model
    evaluations and reproduces the reference output exactly with one fewer
    NFE.
  * Noise is drawn with ``jax.random.fold_in`` per step — deterministic,
    order-independent, replay-stable.
  * The UNet runs in its compute dtype (bfloat16 on TPU); the carried state,
    prox, and renoise algebra stay float32 (mixed-precision boundary mirrors
    ``main_ddpir.py:397``'s ``.float()`` cast).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.ops.fft_prox import ProxOperator, prox_solve
from diffpir_tpu.ops.resize import Resizer2D
from diffpir_tpu.schedule import NoiseSchedule, TrajectoryPlan

__all__ = [
    "DenoiserState", "make_denoiser", "make_inpaint_prox", "make_fft_prox",
    "make_cubic_sr_prox", "diffpir_sample", "xprev_sample", "init_x",
]


# ---------------------------------------------------------------------------
# Denoiser wrapper
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class DenoiserState:
    """Bound model + schedule tables for x0-prediction."""

    apply_fn: Callable                  # (params, x, t_vec) -> model output (B,H,W,6 or 3)
    params: object
    sqrt_recip_acp: jnp.ndarray         # (T,)
    sqrt_recipm1_acp: jnp.ndarray       # (T,)
    learn_sigma: bool = True
    compute_dtype: jnp.dtype = jnp.float32


def make_denoiser(apply_fn, params, schedule: NoiseSchedule, *,
                  learn_sigma: bool = True,
                  compute_dtype=jnp.float32) -> DenoiserState:
    return DenoiserState(
        apply_fn=apply_fn, params=params,
        sqrt_recip_acp=jnp.asarray(schedule.sqrt_recip_alphas_cumprod, jnp.float32),
        sqrt_recipm1_acp=jnp.asarray(schedule.sqrt_recipm1_alphas_cumprod, jnp.float32),
        learn_sigma=learn_sigma, compute_dtype=compute_dtype,
    )


def denoise_x0(den: DenoiserState, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """x0_hat = clip(sqrt(1/acp_t) x - sqrt(1/acp_t - 1) eps_theta(x, t), -1, 1).

    The 'pred_xstart' path of reference ``model_fn`` -> ``p_mean_variance``
    (``gaussian_diffusion.py:293-311``): the epsilon head is the first 3 output
    channels (learned-variance half unused here), and x0 is clamped BEFORE any
    posterior computation — clamp placement is PSNR-relevant (SURVEY.md §7).
    """
    b = x.shape[0]
    t_vec = jnp.broadcast_to(jnp.asarray(t, jnp.int32), (b,))
    out = den.apply_fn(den.params, x.astype(den.compute_dtype), t_vec)
    eps = out[..., : x.shape[-1]].astype(jnp.float32)
    x0 = den.sqrt_recip_acp[t] * x - den.sqrt_recipm1_acp[t] * eps
    return jnp.clip(x0, -1.0, 1.0)


def denoise_output(den: DenoiserState, x: jnp.ndarray, t: jnp.ndarray,
                   output_type: str = "pred_xstart") -> jnp.ndarray:
    """Denoiser output in the reference ``model_fn`` vocabulary
    (``utils/utils_model.py:242-258``): pred_xstart | epsilon | score.

    epsilon/score are re-derived from the clamped x0 exactly as the reference
    does (it converts out["pred_xstart"], not the raw model eps).
    """
    x0 = denoise_x0(den, x, t)
    if output_type == "pred_xstart":
        return x0
    sqrt_acp = 1.0 / den.sqrt_recip_acp[t]
    sqrt_1m = den.sqrt_recipm1_acp[t] / den.sqrt_recip_acp[t]
    eps = (x - sqrt_acp * x0) / sqrt_1m
    if output_type == "epsilon":
        return eps
    if output_type == "score":
        return -eps / sqrt_1m
    raise ValueError(f"unknown output_type {output_type!r}")


# ---------------------------------------------------------------------------
# Data-fidelity proximal operators (x0 domain [-1, 1])
# ---------------------------------------------------------------------------

def make_inpaint_prox(y: jnp.ndarray, mask: jnp.ndarray,
                      guidance_scale: float = 1.0) -> Callable:
    """Masked-average prox (reference ``main_ddpir.py:393-394``).

    y in [0,1], mask in {0,1} broadcastable to y.
    """
    y2 = (2.0 * y - 1.0).astype(jnp.float32)
    mask = mask.astype(jnp.float32)

    def prox(x0: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
        x0_p = (mask * y2 + tau * x0) / (mask + tau)
        return x0 + guidance_scale * (x0_p - x0)

    return prox


def make_fft_prox(op: ProxOperator, guidance_scale: float = 1.0) -> Callable:
    """FFT closed-form prox for deblur / blur-SR (``main_ddpir.py:395-400``)."""

    def prox(x0: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
        x0_p = prox_solve(x0 * 0.5 + 0.5, op, tau)
        x0_p = x0_p * 2.0 - 1.0
        return x0 + guidance_scale * (x0_p - x0)

    return prox


def make_cubic_sr_prox(y: jnp.ndarray, sf: int, *, gamma: float = 0.01,
                       in_iter: int = 1, hr_hw: tuple[int, int]) -> Callable:
    """Iterative back-projection prox for cubic SR (``main_ddpir.py:401-406``).

    down = MATLAB-cubic antialiased 1/sf resize (reference ``Resizer``),
    up = nearest x sf (reference ``partial(F.interpolate, scale_factor=sf)``,
    default mode is nearest).
    """
    down = Resizer2D(hr_hw, 1.0 / sf)
    y = y.astype(jnp.float32)

    def up_nearest(v: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = v.shape
        v = jnp.broadcast_to(v[:, :, None, :, None, :], (b, h, sf, w, sf, c))
        return v.reshape(b, h * sf, w * sf, c)

    def prox(x0: jnp.ndarray, tau: jnp.ndarray) -> jnp.ndarray:
        for _ in range(in_iter):
            x01 = x0 * 0.5 + 0.5
            x01 = x01 + gamma * up_nearest(y - down(x01)) / (1.0 + tau)
            x0 = x01 * 2.0 - 1.0
        return x0

    return prox


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def init_x(task: str, y: jnp.ndarray, mask: Optional[jnp.ndarray], sf: int,
           *, sqrt_acp_start: float, sqrt_1m_acp_start: float,
           key: jax.Array, ty: Optional[tuple[float, float]] = None) -> jnp.ndarray:
    """x_{t_start} initialization (reference ``main_ddpir.py:293-316``).

    sr: cubic-upsampled y; deblur: y; inpaint: y*mask — then diffused to
    t_start with the forward kernel.

    ty: optional ``(sqrt_acp[t_y], sqrt_1m_acp[t_y])`` — the reference's
    standalone deblur driver treats the noisy observation y as already sitting
    at timestep t_y (the step whose equivalent image-noise sigma matches
    2*noise_level_img) and diffuses it the REST of the way with the
    effective-alpha formula (``main_ddpir_deblur.py:227-231``):
        sae = sqrt_acp[t_start] / sqrt_acp[t_y]
        x   = sae*(2y-1) + sqrt(sqrt_1m_acp[t_start]^2
                                - sae^2*sqrt_1m_acp[t_y]^2) * n
    i.e. the injected variance is reduced by the noise y already carries.
    """
    if task == "sr":
        hr = (y.shape[1] * sf, y.shape[2] * sf)
        # the reference initializes with torch F.interpolate bicubic (a=-0.75,
        # align_corners=False, main_ddpir.py:295), not the MATLAB a=-0.5 kernel
        x = Resizer2D((y.shape[1], y.shape[2]), float(sf),
                      kernel="cubic_torch", antialiasing=False)(y)
        assert x.shape[1:3] == hr
    elif task == "deblur":
        x = y
    elif task == "inpaint":
        x = y * mask
    else:
        raise ValueError(task)
    x = x.astype(jnp.float32)
    noise = jax.random.normal(key, x.shape, jnp.float32)
    if ty is not None:
        sqrt_acp_ty, sqrt_1m_acp_ty = ty
        sae = sqrt_acp_start / sqrt_acp_ty
        coef = float(np.sqrt(max(
            sqrt_1m_acp_start**2 - sae**2 * sqrt_1m_acp_ty**2, 0.0)))
        return sae * (2.0 * x - 1.0) + coef * noise
    return sqrt_acp_start * (2.0 * x - 1.0) + sqrt_1m_acp_start * noise


# ---------------------------------------------------------------------------
# The trajectory
# ---------------------------------------------------------------------------

def xprev_sample(
    diffusion,
    model_fn: Callable,
    plan: TrajectoryPlan,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    y: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    ddim: bool = False,
    recover_known: bool = True,
    lam_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """``model_output_type='pred_x_prev'`` trajectories.

    Reference semantics (``main_ddpir.py:365-366, 414-419``): each macro step
    takes ONE ancestral (or DDIM) micro-step of the base chain at t_i; for
    inpainting the masked-average prox is then applied to the sampled x
    directly; there is no DiffPIR renoise, and the final step's model call IS
    consumed.  For deblur/SR the reference applies NO data term at all in
    this mode (its analytic-solve branch is inpaint-only,
    ``main_ddpir.py:414``; deblur/sr fall through to the plain chain) — pass
    ``mask=None`` for that behavior.  Build the plan with
    ``rho_mode='xprev'`` (sigma_k = sqrt(beta/alpha), ``main_ddpir.py:282-283``).
    """
    t_tab = jnp.asarray(plan.t)
    rho_tab = jnp.asarray(plan.rho)
    prox_tab = jnp.asarray(plan.prox)
    y2 = None if y is None else (2.0 * y - 1.0).astype(jnp.float32)
    n = plan.n_steps
    # optional per-sample lambda (rho is linear in lambda; see diffpir_sample)
    lam_b = (None if lam_scale is None
             else jnp.asarray(lam_scale, jnp.float32).reshape(-1, 1, 1, 1))

    def step(x, i):
        b = x.shape[0]
        t_vec = jnp.full((b,), t_tab[i], jnp.int32)
        k = jax.random.fold_in(key, i)
        out = (diffusion.ddim_sample(model_fn, x, t_vec, k) if ddim
               else diffusion.p_sample(model_fn, x, t_vec, k))
        x = out["sample"]
        if mask is not None:
            tau = rho_tab[i] if lam_b is None else rho_tab[i] * lam_b
            x_p = (mask * y2 + tau * x) / (mask + tau)
            x = jnp.where(prox_tab[i] & (i < n - 1), x_p, x)
        return x, None

    x, _ = jax.lax.scan(step, x_init, jnp.arange(n))
    if recover_known and mask is not None:
        x = mask * y2 + (1.0 - mask) * x
    return x * 0.5 + 0.5


def _plan_to_device(plan: TrajectoryPlan) -> dict:
    return {
        "t": jnp.asarray(plan.t),
        "sqrt_acp_t": jnp.asarray(plan.sqrt_acp_t),
        "sqrt_1m_acp_t": jnp.asarray(plan.sqrt_1m_acp_t),
        "sqrt_acp_prev": jnp.asarray(plan.sqrt_acp_prev),
        "sqrt_1m_acp_prev": jnp.asarray(plan.sqrt_1m_acp_prev),
        "rho": jnp.asarray(plan.rho),
        "eta_sigma": jnp.asarray(plan.eta_sigma),
        "prox": jnp.asarray(plan.prox),
        "renoise": jnp.asarray(plan.renoise),
    }


def diffpir_sample(
    den: DenoiserState,
    prox_fn: Optional[Callable],
    plan: TrajectoryPlan,
    x_init: jnp.ndarray,
    key: jax.Array,
    *,
    zeta: float = 0.25,
    iter_num_U: int = 1,
    generate_mode: str = "DiffPIR",
    y: Optional[jnp.ndarray] = None,
    mask: Optional[jnp.ndarray] = None,
    recover_known: bool = False,
    progress_slots: Optional[np.ndarray] = None,
    lam_scale: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Run the full DiffPIR trajectory; returns the restored image in [0, 1].

    Semantics (verified against the reference loop in
    ``tests/test_sampler_golden.py``):
      * steps 0..n-2 each do denoise -> (prox) -> renoise; the reference's
        n-th denoise is skipped because its result is never consumed (see
        module docstring).
      * 'repaint' re-injects forward-diffused known pixels before each
        denoise (``main_ddpir.py:355-358``).
      * 'vanilla' runs prior-only (no prox) but keeps the DiffPIR renoise.
      * iter_num_U > 1 re-noises x_{t-1} back to x_t between inner repeats
        (``main_ddpir.py:462-467``).
      * recover_known overwrites observed pixels at the end
        (``main_ddpir.py:475-476``).
      * progress_slots (optional, length n_steps, int: slot index or -1)
        additionally returns intermediate states for visualization — the
        reference's ``progress_seq`` snapshots (``main_ddpir.py:336-338``,
        progressive saving ``main_ddpir_sisr.py:426-432``).  Snapshots live in
        a fixed carry buffer so the scan stays O(n_slots) memory.
    """
    tables = _plan_to_device(plan)
    n = plan.n_steps
    # the reference runs the data prox ONLY in DiffPIR mode; repaint conditions
    # purely via noised-known-pixel injection (main_ddpir.py:384-386)
    use_prox = generate_mode == "DiffPIR" and prox_fn is not None
    # zeta may be a traced scalar (runner passes it as a jit argument so
    # lambda/zeta sweeps reuse one compiled program) — keep the sqrt in-graph.
    # It may also be PER-SAMPLE (B,): one batch carrying heterogeneous
    # operating points (coalesced serving requests / single-launch lambda
    # grids); same for lam_scale, which scales the plan's rho tables (rho is
    # linear in lambda, main_ddpir.py:274-286 — per-sample plans are built
    # with lambda=1 and scaled in-graph).
    zeta = jnp.asarray(zeta, jnp.float32)
    if zeta.ndim:
        zeta = zeta.reshape(-1, 1, 1, 1)
    sqrt_zeta = jnp.sqrt(zeta)
    sqrt_1m_zeta = jnp.sqrt(1.0 - zeta)
    lam_b = (None if lam_scale is None
             else jnp.asarray(lam_scale, jnp.float32).reshape(-1, 1, 1, 1))
    y2 = None if y is None else (2.0 * y - 1.0).astype(jnp.float32)

    def one_u(x: jnp.ndarray, s: dict, key: jax.Array, u: int, last_u: bool):
        if generate_mode == "repaint":
            k_rp, key = jax.random.split(key)
            noised_known = (s["sqrt_acp_t"] * y2 +
                            s["sqrt_1m_acp_t"] * jax.random.normal(k_rp, x.shape))
            x = noised_known * mask + (1.0 - mask) * x

        x0 = denoise_x0(den, x, s["t"])
        if use_prox:
            tau = s["rho"] if lam_b is None else s["rho"] * lam_b
            x0 = jnp.where(s["prox"], prox_fn(x0, tau), x0)

        # DDIM-like renoise to t_{i-1}.  The reference gate is
        # `not (seq[i] == seq[-1] and u == iter_num_U-1)` (main_ddpir.py:448):
        # a quad sequence can END in duplicate values (iter_num >= ~502 makes
        # seq[-2] == seq[-1]), and such duplicate-of-last rows must leave x
        # untouched at the final inner repeat — the plan's per-row `renoise`
        # flag carries exactly `seq[j] != seq[-1]`.
        eps_hat = (x - s["sqrt_acp_t"] * x0) / s["sqrt_1m_acp_t"]
        k1, k2, k3, key = jax.random.split(key, 4)
        n1 = jax.random.normal(k1, x.shape, jnp.float32)
        n2 = jax.random.normal(k2, x.shape, jnp.float32)
        dir_coef = jnp.sqrt(jnp.maximum(
            s["sqrt_1m_acp_prev"] ** 2 - s["eta_sigma"] ** 2, 0.0))
        renoised = (s["sqrt_acp_prev"] * x0
                    + sqrt_1m_zeta * (dir_coef * eps_hat + s["eta_sigma"] * n1)
                    + sqrt_zeta * s["sqrt_1m_acp_prev"] * n2)
        if last_u:
            x = jnp.where(s["renoise"], renoised, x)
        else:
            x = renoised
            # set back x_{t-1} -> x_t for the next inner repeat — skipped on
            # duplicate-of-last rows (main_ddpir.py:462: `seq[i] != seq[-1]`)
            sae = s["sqrt_acp_t"] / s["sqrt_acp_prev"]
            var = s["sqrt_1m_acp_t"] ** 2 - sae ** 2 * s["sqrt_1m_acp_prev"] ** 2
            n3 = jax.random.normal(k3, x.shape, jnp.float32)
            x = jnp.where(s["renoise"],
                          sae * x + jnp.sqrt(jnp.maximum(var, 0.0)) * n3, x)
        return x

    n_slots = 0 if progress_slots is None else int(progress_slots.max()) + 1
    slots_tab = (None if progress_slots is None
                 else jnp.asarray(progress_slots, jnp.int32))

    def step(carry, i):
        x, frames = carry
        s = {k: v[i] for k, v in tables.items()}
        for u in range(iter_num_U):
            x = one_u(x, s, jax.random.fold_in(jax.random.fold_in(key, i), u),
                      u, last_u=(u == iter_num_U - 1))
        if frames is not None:
            slot = slots_tab[i]
            updated = jax.lax.dynamic_update_index_in_dim(
                frames, x * 0.5 + 0.5, jnp.maximum(slot, 0), 0)
            frames = jnp.where(slot >= 0, updated, frames)
        return (x, frames), None

    frames0 = (None if n_slots == 0
               else jnp.zeros((n_slots,) + x_init.shape, jnp.float32))
    # steps 0..n-2: the reference's final (n-1) step performs a denoise whose
    # output is discarded, so it is omitted here (identical math, one fewer
    # NFE).  For iter_num_U > 1 the reference's final row is UNDEFINED — its
    # renoise block indexes seq[i+1] past the end (main_ddpir.py:448-453
    # raises IndexError; every shipped reference config uses iter_num_U=1) —
    # so omitting it is also the crash-free repair of that path.
    (x, frames), _ = jax.lax.scan(step, (x_init, frames0), jnp.arange(n - 1))

    if recover_known and mask is not None:
        x = mask * y2 + (1.0 - mask) * x
    x01 = x * 0.5 + 0.5
    if frames is not None:
        # the slot assigned to the (skipped) final step gets the final state
        last_slot = slots_tab[n - 1]
        updated = jax.lax.dynamic_update_index_in_dim(
            frames, x01, jnp.maximum(last_slot, 0), 0)
        frames = jnp.where(last_slot >= 0, updated, frames)
        return x01, frames
    return x01
