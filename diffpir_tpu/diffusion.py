"""Gaussian diffusion processes: sampling and training losses (functional JAX).

Capability parity with the vendored OpenAI guided-diffusion core the reference
ships (``guided_diffusion/gaussian_diffusion.py``), rebuilt as pure functions
over a ``NoiseSchedule``:

  * ``q_sample``            == ``gaussian_diffusion.py:188-206``
  * ``p_mean_variance``     == ``:232-326`` (LEARNED_RANGE interpolation,
                                x0 clamp before the posterior mean)
  * ``p_sample``/``ddim_sample``     == ``:395-439`` / ``:537-585``
  * ``p_sample_loop``/``ddim_sample_loop`` — as ``lax.scan`` (no Python loop)
  * ``training_losses``     == ``:744-817`` (MSE + frozen-mean VLB term)
  * ``vb_terms``            == ``:709-742``; ``normal_kl`` and
    ``discretized_gaussian_log_likelihood`` == ``losses.py:12-77``

Timesteps may differ per batch element (training); all schedule gathers are
vectorized ``table[t]`` with trailing broadcast, the jnp analogue of
``_extract_into_tensor`` (``gaussian_diffusion.py:895-908``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.schedule import NoiseSchedule

__all__ = ["Diffusion", "ModelMeanType", "ModelVarType", "normal_kl",
           "discretized_gaussian_log_likelihood"]


class ModelMeanType:
    PREVIOUS_X = "previous_x"
    START_X = "start_x"
    EPSILON = "epsilon"


class ModelVarType:
    LEARNED = "learned"
    FIXED_SMALL = "fixed_small"
    FIXED_LARGE = "fixed_large"
    LEARNED_RANGE = "learned_range"


def _bx(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-element schedule entries and broadcast over trailing dims."""
    return table[t].reshape(t.shape + (1,) * (ndim - 1))


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, e^logvar1) || N(mean2, e^logvar2)), elementwise in nats."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def _approx_std_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of images discretized to 256 bins (reference ``losses.py:50-77``)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_plus = _approx_std_normal_cdf(plus_in)
    cdf_min = _approx_std_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, min=1e-12))))


def _mean_flat(x):
    return x.mean(axis=tuple(range(1, x.ndim)))


@dataclasses.dataclass(frozen=True)
class Diffusion:
    """Schedule tables bound with model-output semantics.

    model_fn signature: ``model_fn(x, t_vec) -> (B, ..., C or 2C)`` where the
    variance half (when learned) is concatenated on the channel (last) axis.
    """

    schedule: NoiseSchedule
    model_mean_type: str = ModelMeanType.EPSILON
    model_var_type: str = ModelVarType.LEARNED_RANGE

    # -- cached device tables ------------------------------------------------
    def _t(self, name: str) -> jnp.ndarray:
        return jnp.asarray(getattr(self.schedule, name), jnp.float32)

    # -- forward process -----------------------------------------------------
    def q_sample(self, x0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        nd = x0.ndim
        return (_bx(self._t("sqrt_alphas_cumprod"), t, nd) * x0
                + _bx(self._t("sqrt_one_minus_alphas_cumprod"), t, nd) * noise)

    def q_posterior_mean(self, x0, x_t, t):
        nd = x_t.ndim
        return (_bx(self._t("posterior_mean_coef1"), t, nd) * x0
                + _bx(self._t("posterior_mean_coef2"), t, nd) * x_t)

    # -- reverse process -----------------------------------------------------
    def p_mean_variance(self, model_fn: Callable, x: jnp.ndarray, t: jnp.ndarray,
                        clip_denoised: bool = True,
                        model_output: Optional[jnp.ndarray] = None) -> dict:
        nd = x.ndim
        C = x.shape[-1]
        out = model_fn(x, t) if model_output is None else model_output
        out = out.astype(jnp.float32)

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            out, var_values = out[..., :C], out[..., C:]
            if self.model_var_type == ModelVarType.LEARNED:
                log_variance = var_values
            else:
                min_log = _bx(self._t("posterior_log_variance_clipped"), t, nd)
                max_log = _bx(jnp.log(self._t("betas")), t, nd)
                frac = (var_values + 1.0) / 2.0
                log_variance = frac * max_log + (1.0 - frac) * min_log
        elif self.model_var_type == ModelVarType.FIXED_SMALL:
            log_variance = _bx(self._t("posterior_log_variance_clipped"), t, nd)
        else:  # FIXED_LARGE
            pv = np.append(self.schedule.posterior_variance[1], self.schedule.betas[1:])
            log_variance = _bx(jnp.asarray(np.log(pv), jnp.float32), t, nd)

        def clip(v):
            return jnp.clip(v, -1.0, 1.0) if clip_denoised else v

        if self.model_mean_type == ModelMeanType.PREVIOUS_X:
            c1 = _bx(self._t("posterior_mean_coef1"), t, nd)
            c2 = _bx(self._t("posterior_mean_coef2"), t, nd)
            pred_xstart = clip(out / c1 - (c2 / c1) * x)
            mean = out
        else:
            if self.model_mean_type == ModelMeanType.START_X:
                pred_xstart = clip(out)
            else:  # EPSILON
                pred_xstart = clip(
                    _bx(self._t("sqrt_recip_alphas_cumprod"), t, nd) * x
                    - _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, nd) * out)
            mean = self.q_posterior_mean(pred_xstart, x, t)
        return {"mean": mean, "log_variance": log_variance,
                "pred_xstart": pred_xstart}

    def condition_mean(self, cond_fn, p_mean_var: dict, x, t) -> jnp.ndarray:
        """Classifier-guidance mean shift: mean + var * grad log p(y|x)
        (reference ``gaussian_diffusion.py:356-372``)."""
        gradient = cond_fn(x, t)
        return (p_mean_var["mean"]
                + jnp.exp(p_mean_var["log_variance"]) * gradient.astype(jnp.float32))

    def condition_score(self, cond_fn, p_mean_var: dict, x, t) -> dict:
        """Score-based conditioning for DDIM (reference ``:374-393``):
        eps <- eps - sqrt(1-acp_t) * grad; recompute x0 and posterior mean."""
        nd = x.ndim
        ab = _bx(self._t("alphas_cumprod"), t, nd)
        eps = ((_bx(self._t("sqrt_recip_alphas_cumprod"), t, nd) * x
                - p_mean_var["pred_xstart"])
               / _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, nd))
        eps = eps - jnp.sqrt(1 - ab) * cond_fn(x, t).astype(jnp.float32)
        pred_xstart = (_bx(self._t("sqrt_recip_alphas_cumprod"), t, nd) * x
                       - _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, nd) * eps)
        out = dict(p_mean_var)
        out["pred_xstart"] = pred_xstart
        out["mean"] = self.q_posterior_mean(pred_xstart, x, t)
        return out

    def p_sample(self, model_fn, x, t, key, clip_denoised: bool = True,
                 cond_fn=None) -> dict:
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        noise = jax.random.normal(key, x.shape, jnp.float32)
        nonzero = (t != 0).astype(jnp.float32).reshape(t.shape + (1,) * (x.ndim - 1))
        if cond_fn is not None:
            out["mean"] = self.condition_mean(cond_fn, out, x, t)
        sample = out["mean"] + nonzero * jnp.exp(0.5 * out["log_variance"]) * noise
        return {"sample": sample, "pred_xstart": out["pred_xstart"]}

    def ddim_sample(self, model_fn, x, t, key, eta: float = 0.0,
                    clip_denoised: bool = True, cond_fn=None) -> dict:
        nd = x.ndim
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        if cond_fn is not None:
            out = self.condition_score(cond_fn, out, x, t)
        eps = ((_bx(self._t("sqrt_recip_alphas_cumprod"), t, nd) * x
                - out["pred_xstart"])
               / _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, nd))
        ab = _bx(self._t("alphas_cumprod"), t, nd)
        ab_prev = _bx(self._t("alphas_cumprod_prev"), t, nd)
        sigma = (eta * jnp.sqrt((1 - ab_prev) / (1 - ab))
                 * jnp.sqrt(1 - ab / ab_prev))
        noise = jax.random.normal(key, x.shape, jnp.float32)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(ab_prev)
                     + jnp.sqrt(1 - ab_prev - sigma**2) * eps)
        nonzero = (t != 0).astype(jnp.float32).reshape(t.shape + (1,) * (nd - 1))
        return {"sample": mean_pred + nonzero * sigma * noise,
                "pred_xstart": out["pred_xstart"]}

    def _sample_loop(self, sample_step, model_fn, shape, key, noise):
        T = self.schedule.num_timesteps
        k_init, k_loop = jax.random.split(key)
        img = noise if noise is not None else jax.random.normal(k_init, shape, jnp.float32)

        def body(x, i):
            t = jnp.full((shape[0],), T - 1 - i, jnp.int32)
            out = sample_step(model_fn, x, t, jax.random.fold_in(k_loop, i))
            return out["sample"], None

        img, _ = jax.lax.scan(body, img, jnp.arange(T))
        return img

    def p_sample_loop(self, model_fn, shape, key, noise=None):
        """Unconditional ancestral sampling, whole chain as one lax.scan."""
        return self._sample_loop(self.p_sample, model_fn, shape, key, noise)

    def ddim_sample_loop(self, model_fn, shape, key, noise=None, eta: float = 0.0):
        step = lambda m, x, t, k: self.ddim_sample(m, x, t, k, eta=eta)
        return self._sample_loop(step, model_fn, shape, key, noise)

    def ddim_reverse_sample(self, model_fn, x, t, clip_denoised: bool = True) -> dict:
        """Deterministic reverse-ODE step x_t -> x_{t+1}
        (reference ``gaussian_diffusion.py:587-633``, eta must be 0)."""
        nd = x.ndim
        out = self.p_mean_variance(model_fn, x, t, clip_denoised)
        eps = ((_bx(self._t("sqrt_recip_alphas_cumprod"), t, nd) * x
                - out["pred_xstart"])
               / _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, nd))
        ab_next = _bx(self._t("alphas_cumprod_next"), t, nd)
        mean_pred = (out["pred_xstart"] * jnp.sqrt(ab_next)
                     + jnp.sqrt(1 - ab_next) * eps)
        return {"sample": mean_pred, "pred_xstart": out["pred_xstart"]}

    # -- training ------------------------------------------------------------
    def vb_terms(self, model_fn, x0, x_t, t, clip_denoised: bool = False,
                 model_output: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        nd = x_t.ndim
        true_mean = self.q_posterior_mean(x0, x_t, t)
        true_logvar = _bx(self._t("posterior_log_variance_clipped"), t, nd)
        out = self.p_mean_variance(model_fn, x_t, t, clip_denoised,
                                   model_output=model_output)
        kl = _mean_flat(normal_kl(true_mean, true_logvar,
                                  out["mean"], out["log_variance"])) / np.log(2.0)
        nll = -_mean_flat(discretized_gaussian_log_likelihood(
            x0, means=out["mean"], log_scales=0.5 * out["log_variance"])) / np.log(2.0)
        return jnp.where(t == 0, nll, kl)

    def training_losses(self, model_fn, x0, t, key, noise=None) -> dict:
        """MSE (+ frozen-mean VLB for learned variance); returns per-example terms."""
        if noise is None:
            noise = jax.random.normal(key, x0.shape, jnp.float32)
        x_t = self.q_sample(x0, t, noise)
        model_output = model_fn(x_t, t).astype(jnp.float32)
        terms = {}
        C = x0.shape[-1]

        if self.model_var_type in (ModelVarType.LEARNED, ModelVarType.LEARNED_RANGE):
            mean_out, var_values = model_output[..., :C], model_output[..., C:]
            # variance learns through the VLB but must not pull the mean
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_out), var_values], axis=-1)
            terms["vb"] = self.vb_terms(None, x0, x_t, t, model_output=frozen)
        else:
            mean_out = model_output

        target = {
            ModelMeanType.PREVIOUS_X: self.q_posterior_mean(x0, x_t, t),
            ModelMeanType.START_X: x0,
            ModelMeanType.EPSILON: noise,
        }[self.model_mean_type]
        terms["mse"] = _mean_flat((target - mean_out) ** 2)
        terms["loss"] = terms["mse"] + terms.get("vb", 0.0)
        return terms

    def prior_bpd(self, x0: jnp.ndarray) -> jnp.ndarray:
        """KL(q(x_T|x_0) || N(0, I)) in bits/dim (reference ``:819-836``)."""
        b = x0.shape[0]
        t = jnp.full((b,), self.schedule.num_timesteps - 1, jnp.int32)
        nd = x0.ndim
        mean = _bx(self._t("sqrt_alphas_cumprod"), t, nd) * x0
        logvar = _bx(jnp.log(1.0 - self._t("alphas_cumprod")), t, nd)
        kl = normal_kl(mean, logvar, jnp.zeros_like(mean), jnp.zeros_like(logvar))
        return _mean_flat(kl) / np.log(2.0)

    def calc_bpd_loop(self, model_fn, x0: jnp.ndarray, key: jax.Array) -> dict:
        """Full-chain variational bits/dim evaluation
        (reference ``gaussian_diffusion.py:838-892``), as one lax.scan."""
        T = self.schedule.num_timesteps
        b = x0.shape[0]

        def body(carry, i):
            t = jnp.full((b,), T - 1 - i, jnp.int32)
            k = jax.random.fold_in(key, i)
            noise = jax.random.normal(k, x0.shape, jnp.float32)
            x_t = self.q_sample(x0, t, noise)
            vb = self.vb_terms(model_fn, x0, x_t, t, clip_denoised=True)
            out = self.p_mean_variance(model_fn, x_t, t, clip_denoised=True)
            xstart_mse = _mean_flat((out["pred_xstart"] - x0) ** 2)
            eps = ((_bx(self._t("sqrt_recip_alphas_cumprod"), t, x0.ndim) * x_t
                    - out["pred_xstart"])
                   / _bx(self._t("sqrt_recipm1_alphas_cumprod"), t, x0.ndim))
            mse = _mean_flat((eps - noise) ** 2)
            return carry, (vb, xstart_mse, mse)

        _, (vb, xstart_mse, mse) = jax.lax.scan(body, None, jnp.arange(T))
        prior = self.prior_bpd(x0)
        total = vb.sum(axis=0) + prior
        return {"total_bpd": total, "prior_bpd": prior, "vb": vb.T,
                "xstart_mse": xstart_mse.T, "mse": mse.T}
