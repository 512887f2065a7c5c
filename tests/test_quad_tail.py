"""Duplicate-of-last sequence rows must be complete no-ops.

Quad skip sequences can end in repeated values (``int(sqrt(linspace))``
collides near the top; with T=1000 this happens for iter_num >= ~502).  The
reference gates prox, renoise, AND the iter_num_U set-back on
``seq[i] != seq[-1]`` **by value** (main_ddpir.py:384,448,462), so a
duplicate-of-last row leaves x untouched (one wasted NFE).  The scan must
honor the plan's per-row ``renoise`` flag rather than renoising every row.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diffpir_tpu.sampler import (DenoiserState, diffpir_sample,
                                 make_inpaint_prox)
from diffpir_tpu.schedule import NoiseSchedule, build_plan, make_seq

T = 20
ITERS = 15  # make_seq(20, 15, "quad") ends in a duplicate: seq[-2] == seq[-1]


def _fake_denoiser(sched):
    """Cheap deterministic eps-model: eps_hat = 0.05 * x (learned var zeros)."""
    def apply_fn(params, x, t_vec):
        return jnp.concatenate([0.05 * x, jnp.zeros_like(x)], axis=-1)

    return DenoiserState(
        apply_fn=apply_fn, params=None,
        sqrt_recip_acp=jnp.asarray(sched.sqrt_recip_alphas_cumprod, jnp.float32),
        sqrt_recipm1_acp=jnp.asarray(sched.sqrt_recipm1_alphas_cumprod, jnp.float32))


def test_quad_tail_duplicates_are_noops():
    seq = make_seq(T, ITERS, "quad")
    assert seq[-2] == seq[-1], "fixture must exercise a duplicate tail"

    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    plan = build_plan(sched, iter_num=ITERS, skip_type="quad", lambda_=1.0,
                      eta=0.3, sigma_y=0.05)
    assert not plan.renoise[-2] and not plan.prox[-2]

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.random((2, 8, 8, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((2, 8, 8, 1)) > 0.5), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    den = _fake_denoiser(sched)
    prox = make_inpaint_prox(y, mask)
    key = jax.random.PRNGKey(3)

    kw = dict(zeta=0.7, generate_mode="DiffPIR", y=y, mask=mask)
    out = diffpir_sample(den, prox, plan, x0, key, **kw)
    # dropping the duplicate row entirely must not change the result
    # (the scan's noise keys are per-row-index, identical for rows 0..n-3)
    trunc = dataclasses.replace(
        plan, **{f.name: getattr(plan, f.name)[:-1]
                 for f in dataclasses.fields(plan)})
    out_trunc = diffpir_sample(den, prox, trunc, x0, key, **kw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_trunc),
                               atol=1e-6)


def test_quad_tail_noop_with_inner_repeats():
    """iter_num_U > 1: the duplicate row still renoises at u < U-1 (reference
    gate is per-u) but never sets back — the row must at least stay finite and
    the plan flags consistent."""
    sched = NoiseSchedule.linear(0.0001, 0.02, T)
    plan = build_plan(sched, iter_num=ITERS, skip_type="quad", lambda_=1.0,
                      eta=0.0, sigma_y=0.05)
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    mask = jnp.asarray(np.ones((1, 8, 8, 1)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    den = _fake_denoiser(sched)
    out = diffpir_sample(den, make_inpaint_prox(y, mask), plan, x0,
                         jax.random.PRNGKey(0), zeta=0.5, iter_num_U=2,
                         generate_mode="DiffPIR", y=y, mask=mask)
    assert np.isfinite(np.asarray(out)).all()
