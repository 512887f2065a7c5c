"""Large-image and ensemble inference utilities.

Capability parity with reference ``utils/utils_model.py:16-195`` (``test_mode``
0-4): pad-to-modulo, recursive overlapping-quadrant splitting for images
larger than the denoiser's comfortable size, and x8 dihedral self-ensembling.

TPU-first design: the 8 dihedral variants are materialized as a stacked
batch and run in ONE model call (the reference loops 8 sequential calls,
``utils_model.py:167-176``) — on TPU the extra batch rides the MXU for free up
to the HBM limit.  Dihedral transforms are expressed as flips/transposes of
the NHWC tensor, which XLA compiles to pure layout ops.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = ["augment8", "invert8", "x8_apply", "pad_modulo_apply", "split_apply",
           "test_mode"]


def test_mode(fn: Callable, x, mode: int = 0, *, refield: int = 32,
              min_size: int = 256, modulo: int = 16):
    """Dispatch over the reference's evaluation modes
    (``utils/utils_model.py:16-45``): 0 = direct, 1 = pad-to-modulo,
    2 = recursive split, 3 = x8 ensemble, 4 = split + x8."""
    if mode == 0:
        return fn(x)
    if mode == 1:
        return pad_modulo_apply(fn, x, modulo)
    if mode == 2:
        return split_apply(fn, x, refield=refield, min_size=min_size,
                           modulo=modulo)
    if mode == 3:
        return x8_apply(fn, x)
    if mode == 4:
        return x8_apply(
            lambda v: split_apply(fn, v, refield=refield, min_size=min_size,
                                  modulo=modulo), x)
    raise ValueError(f"unknown test mode {mode}")


def _dihedral(x: jnp.ndarray, mode: int) -> jnp.ndarray:
    """Mode 0-7 on NHWC batches (parity with utils_image.augment_img)."""
    if mode >= 4:
        x = jnp.transpose(x, (0, 2, 1, 3))
    rot = mode % 4
    if rot == 1:
        x = x[:, ::-1, :, :]
    elif rot == 2:
        x = x[:, ::-1, ::-1, :]
    elif rot == 3:
        x = x[:, :, ::-1, :]
    return x


# flips are involutions; for transpose-first modes the flip axis swaps:
# inv(F_r ∘ T) = T ∘ F_r = F_swap(r) ∘ T with swap: 1<->3
_INV = [0, 1, 2, 3, 4, 7, 6, 5]


def augment8(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,W,C) -> (8B,H,W,C): all dihedral variants stacked on batch."""
    return jnp.concatenate([_dihedral(x, m) for m in range(8)], axis=0)


def invert8(x8: jnp.ndarray) -> jnp.ndarray:
    """Inverse-transform the 8 groups and average -> (B,H,W,C)."""
    b = x8.shape[0] // 8
    parts = [_dihedral(x8[m * b:(m + 1) * b], _INV[m]) for m in range(8)]
    return jnp.mean(jnp.stack(parts), axis=0)


def x8_apply(fn: Callable, x: jnp.ndarray) -> jnp.ndarray:
    """Geometric self-ensemble: run fn on all 8 dihedral variants at once.

    Non-square inputs can't stack the transposed variants with the rotated
    ones, so they take two batched calls (of 4 variants each) instead of one —
    still batched MXU work, never the reference's 8 sequential calls.
    """
    b, h, w, _ = x.shape
    if h == w:
        return invert8(fn(augment8(x)))
    out_r = fn(jnp.concatenate([_dihedral(x, m) for m in range(4)], axis=0))
    out_t = fn(jnp.concatenate([_dihedral(x, m) for m in range(4, 8)], axis=0))
    parts = [_dihedral(out_r[m * b:(m + 1) * b], _INV[m]) for m in range(4)]
    parts += [_dihedral(out_t[(m - 4) * b:(m - 3) * b], _INV[m])
              for m in range(4, 8)]
    return jnp.mean(jnp.stack(parts), axis=0)


def pad_modulo_apply(fn: Callable, x: jnp.ndarray, modulo: int = 16) -> jnp.ndarray:
    """Pad H,W up to a multiple of `modulo` (replicate edge), apply, crop.

    Reference ``test_pad`` (``utils_model.py:60-66``) uses replication padding.
    """
    b, h, w, c = x.shape
    ph = (-h) % modulo
    pw = (-w) % modulo
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
    out = fn(x)
    return out[:, :h, :w, :]


def split_apply(fn: Callable, x: jnp.ndarray, *, refield: int = 32,
                min_size: int = 256, modulo: int = 16) -> jnp.ndarray:
    """Recursive overlapping-quadrant evaluation for very large images.

    Reference ``test_split_fn`` (``utils_model.py:84-117``): quarters overlap
    by `refield` so every output pixel has full receptive-field context; the
    stitched output takes each quadrant's interior.  Shapes are static at
    trace time, so the recursion unrolls into a fixed op tree under jit.
    """
    b, h, w, c = x.shape
    if h * w <= min_size**2:
        return pad_modulo_apply(fn, x, modulo)

    top = slice(0, (h // 2 // refield + 1) * refield)
    bottom = slice(h - (h // 2 // refield + 1) * refield, h)
    left = slice(0, (w // 2 // refield + 1) * refield)
    right = slice(w - (w // 2 // refield + 1) * refield, w)
    quads = [x[:, top, left], x[:, top, right], x[:, bottom, left],
             x[:, bottom, right]]
    outs = [split_apply(fn, q, refield=refield, min_size=min_size,
                        modulo=modulo) for q in quads]

    # output channel count may differ from input (learned-sigma UNets emit 6)
    out = jnp.zeros((b, h, w, outs[0].shape[-1]), outs[0].dtype)
    h2, w2 = math.ceil(h / 2), math.ceil(w / 2)
    out = out.at[:, :h2, :w2].set(outs[0][:, :h2, :w2])
    out = out.at[:, :h2, w2:].set(outs[1][:, :h2, w2 - w:])
    out = out.at[:, h2:, :w2].set(outs[2][:, h2 - h:, :w2])
    out = out.at[:, h2:, w2:].set(outs[3][:, h2 - h:, w2 - w:])
    return out
