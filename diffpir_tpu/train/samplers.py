"""Timestep importance samplers for diffusion training.

Functional JAX rebuild of reference ``guided_diffusion/resample.py``:
  * ``uniform_sample``                  == ``UniformSampler`` (``resample.py:61-67``)
  * ``LossSecondMomentState`` + funcs   == ``LossSecondMomentResampler``
    (``resample.py:124-154``: per-timestep history of the last `history`
    losses, weights sqrt(E[loss^2]) mixed with `uniform_prob` uniform mass).

The reference syncs losses across ranks with ``all_gather``
(``resample.py:70-122``); here the history update is a pure function of
(state, t, losses) — under pjit the batch is already global, so no explicit
collective is needed: every host applies the same deterministic update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["uniform_sample", "LossSecondMomentState", "loss_aware_init",
           "loss_aware_sample", "loss_aware_update"]


def uniform_sample(key: jax.Array, batch: int, num_timesteps: int):
    """(t, weights): uniform timesteps, unit importance weights."""
    t = jax.random.randint(key, (batch,), 0, num_timesteps)
    return t, jnp.ones((batch,), jnp.float32)


class LossSecondMomentState(NamedTuple):
    history: jnp.ndarray      # (T, history_len) float32
    counts: jnp.ndarray       # (T,) int32


def loss_aware_init(num_timesteps: int, history_len: int = 10) -> LossSecondMomentState:
    return LossSecondMomentState(
        history=jnp.zeros((num_timesteps, history_len), jnp.float32),
        counts=jnp.zeros((num_timesteps,), jnp.int32),
    )


def _weights(state: LossSecondMomentState, uniform_prob: float = 0.001) -> jnp.ndarray:
    T, H = state.history.shape
    warmed = (state.counts == H).all()
    w = jnp.sqrt(jnp.mean(state.history**2, axis=-1))
    w = jnp.where(warmed, w, jnp.ones_like(w))
    w = w / w.sum()
    w = w * (1 - uniform_prob) + uniform_prob / T
    return w


def loss_aware_sample(state: LossSecondMomentState, key: jax.Array, batch: int,
                      uniform_prob: float = 0.001):
    """(t, importance weights 1/(T p))."""
    p = _weights(state, uniform_prob)
    t = jax.random.choice(key, p.shape[0], (batch,), p=p)
    weights = 1.0 / (p.shape[0] * p[t])
    return t, weights


def loss_aware_update(state: LossSecondMomentState, t: jnp.ndarray,
                      losses: jnp.ndarray) -> LossSecondMomentState:
    """Insert the batch's per-example losses into each timestep's ring history."""

    def insert_one(state, tl):
        ti, loss = tl
        cnt = state.counts[ti]
        H = state.history.shape[1]
        # ring-buffer semantics of the reference: shift-left when full
        row = state.history[ti]
        row_full = jnp.roll(row, -1).at[H - 1].set(loss)
        row_grow = row.at[jnp.minimum(cnt, H - 1)].set(loss)
        new_row = jnp.where(cnt == H, row_full, row_grow)
        return LossSecondMomentState(
            history=state.history.at[ti].set(new_row),
            counts=state.counts.at[ti].set(jnp.minimum(cnt + 1, H)),
        ), None

    state, _ = jax.lax.scan(insert_one, state, (t, losses))
    return state
