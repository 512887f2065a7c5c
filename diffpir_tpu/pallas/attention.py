"""Fused self-attention Pallas kernel (legacy guided-diffusion QKV layout).

The UNet's attention operates on at most 32x32 = 1024 tokens with head_dim 64
(ffhq: 256 tokens + 64-token middle; imagenet: 1024/256/64 — SURVEY.md §5
"long-context"), so the whole (q,k,v, logits, out) working set of one
(batch, head) pair fits in VMEM.  One single-pass kernel per (batch*head) grid
cell therefore beats a flash-style streaming decomposition: qkv is read from
HBM exactly once, the (T,T) logits never round-trip to HBM (XLA's unfused path
materializes them twice), and the two matmuls ride the MXU back-to-back.

Math parity with ``models.unet._legacy_qkv_attention`` (reference
``guided_diffusion/unet.py:328-354``): channel layout [head][q|k|v][head_dim],
1/sqrt(sqrt(ch)) scaling applied to BOTH q and k, softmax in float32.

Interpret mode (CPU) is selected automatically off-TPU so the same code path
is unit-testable everywhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["legacy_qkv_attention"]


def _attn_kernel(qkv_ref, out_ref, *, ch: int, scale: float):
    qkv = qkv_ref[0]                       # (T, 3*ch)
    q = qkv[:, :ch] * scale
    k = qkv[:, ch:2 * ch] * scale
    v = qkv[:, 2 * ch:]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (T, T)
    w = jax.nn.softmax(logits, axis=-1).astype(qkv.dtype)
    out_ref[0] = jax.lax.dot_general(
        w, v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def legacy_qkv_attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """qkv: (B, T, 3*C) with layout [head][q|k|v][head_dim] -> (B, T, C)."""
    b, t, w3 = qkv.shape
    c = w3 // 3
    ch = c // num_heads
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    interpret = jax.default_backend() != "tpu"

    # head-major layout (B*H, T, 3ch): per-grid-cell blocks then cover the full
    # trailing dims, which is what the Mosaic tiling rules require (3ch=192 is
    # not 128-divisible as a *block* of a larger axis).  XLA fuses this
    # transpose into the producing matmul.
    qkv_h = qkv.reshape(b, t, num_heads, 3 * ch).transpose(0, 2, 1, 3)
    qkv_h = qkv_h.reshape(b * num_heads, t, 3 * ch)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, ch=ch, scale=scale),
        grid=(b * num_heads,),
        in_specs=[pl.BlockSpec((1, t, 3 * ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, t, ch), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * num_heads, t, ch), qkv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * num_heads * t * t * ch,
            bytes_accessed=qkv.size * qkv.dtype.itemsize * 2,
            transcendentals=b * num_heads * t * t,
        ),
    )(qkv_h)
    out = out.reshape(b, num_heads, t, ch).transpose(0, 2, 1, 3)
    return out.reshape(b, t, c)
