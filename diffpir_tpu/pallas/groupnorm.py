"""Fused GroupNorm(32, fp32) + SiLU Pallas kernel.

Replaces the GroupNorm -> SiLU prefix of every ResBlock/attention block
(reference semantics: fp32 statistics and normalization regardless of compute
dtype, ``guided_diffusion/nn.py:17-19``, eps=1e-5) with a single two-phase
kernel:

  phase 0: stream HW chunks, accumulate per-channel sum / sum-of-squares in a
           VMEM scratch accumulator (the TPU grid is sequential per core, so
           the accumulator persists across grid steps);
  phase 1: re-stream the same chunks, normalize with the group statistics and
           apply SiLU, writing bf16/fp32 output.

Group reduction over channels is expressed as a (C x C) same-group averaging
matmul — fully lane-aligned, no sub-128 reshapes.  The input is read from HBM
twice but the fp32 upcast copy of the activation (which XLA materializes for
the unfused fp32-GroupNorm island) never exists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["groupnorm_silu"]


def _kernel(x_ref, scale_ref, bias_ref, gmat_ref, fs_ref, fb_ref, o_ref,
            acc_ref, *, n_elems: float, eps: float, do_silu: bool,
            film: bool):
    p = pl.program_id(1)
    ci = pl.program_id(2)

    @pl.when((p == 0) & (ci == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(p == 0)
    def _accumulate():
        xb = x_ref[0].astype(jnp.float32)           # (chunk, C)
        # 2-D row slices throughout: Mosaic dislikes 1-D intermediates
        acc_ref[0:1, :] += jnp.sum(xb, axis=0, keepdims=True)
        acc_ref[1:2, :] += jnp.sum(xb * xb, axis=0, keepdims=True)

    @pl.when(p == 1)
    def _normalize():
        sums = acc_ref[0:1, :]                       # (1, C)
        sqs = acc_ref[1:2, :]
        # same-group averaging matmul: (1,C) x (C,C) -> per-channel group mean
        mean = jnp.dot(sums, gmat_ref[...],
                       preferred_element_type=jnp.float32) / n_elems
        ex2 = jnp.dot(sqs, gmat_ref[...],
                      preferred_element_type=jnp.float32) / n_elems
        var = ex2 - mean * mean
        inv = jax.lax.rsqrt(var + eps)
        xb = x_ref[0].astype(jnp.float32)
        y = (xb - mean) * inv * scale_ref[0:1, :] + bias_ref[0:1, :]
        if film:
            # FiLM conditioning h*(1+s)+t (ResBlock scale-shift, unet.py:248-252)
            y = y * (1.0 + fs_ref[0]) + fb_ref[0]
        if do_silu:
            y = y * jax.nn.sigmoid(y)
        o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_groups", "eps", "do_silu",
                                             "chunk"))
def groupnorm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                   film_scale: jax.Array | None = None,
                   film_shift: jax.Array | None = None,
                   *, num_groups: int = 32, eps: float = 1e-5,
                   do_silu: bool = True, chunk: int = 512) -> jax.Array:
    """x: (B, H, W, C) -> GroupNorm(num_groups, fp32 stats) [*(1+fs)+fb] (+SiLU).

    film_scale/film_shift: optional per-sample (B, C) FiLM conditioning applied
    between the affine norm and the SiLU (ResBlock scale-shift mode).
    """
    b, h, w, c = x.shape
    hw = h * w
    xr = x.reshape(b, hw, c)
    chunk = min(chunk, hw)
    while hw % chunk:
        chunk //= 2
    n_chunks = hw // chunk
    cg = c // num_groups
    gmat = jnp.asarray(
        np.kron(np.eye(num_groups, dtype=np.float32), np.ones((cg, cg), np.float32)))
    n_elems = float(hw * cg)
    interpret = jax.default_backend() != "tpu"
    film = film_scale is not None
    if not film:
        film_scale = jnp.zeros((b, c), jnp.float32)
        film_shift = jnp.zeros((b, c), jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, n_elems=n_elems, eps=eps, do_silu=do_silu,
                          film=film),
        grid=(b, 2, n_chunks),
        in_specs=[
            pl.BlockSpec((1, chunk, c), lambda i, p, ci: (i, ci, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, p, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, p, ci: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, ci: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, p, ci: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, c), lambda i, p, ci: (i, ci, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((8, c), jnp.float32)],
        interpret=interpret,
    )(xr, scale.reshape(1, c).astype(jnp.float32),
      bias.reshape(1, c).astype(jnp.float32), gmat,
      film_scale.astype(jnp.float32).reshape(b, 1, c),
      film_shift.astype(jnp.float32).reshape(b, 1, c))
    return out.reshape(b, h, w, c)
