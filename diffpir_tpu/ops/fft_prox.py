"""Closed-form FFT data-fidelity proximal solver for SR/deblurring.

Solves  argmin_x ||y - (k * x) ↓sf||^2 + tau ||x - x0||^2  exactly in the
Fourier domain using the distinct-block (sf x sf alias-split) trick.
Behavioral parity with reference ``utils/utils_sisr.py``:

  * ``psf_to_otf``  == ``p2o``           (``utils_sisr.py:22-41``)
  * ``precompute``  == ``pre_calculate`` (``utils_sisr.py:78-95``)
  * ``prox_solve``  == ``data_solution`` (``utils_sisr.py:65-75``)
  * ``upsample_zeros``/``downsample_strided`` == ``upsample``/``downsample``
    (``utils_sisr.py:44-61``)

TPU-first design: NHWC layout (FFTs over the two middle axes), complex64
throughout (the prox is an explicit fp32 island — the UNet runs bfloat16, see
``main_ddpir.py:397`` casting to float), the sf-alias mean expressed as a
reshape-mean (no dynamic chunk/cat), and everything batched so one jitted call
serves the whole device-sharded batch inside the sampler scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["psf_to_otf", "ProxOperator", "precompute", "prox_solve",
           "upsample_zeros", "downsample_strided", "alias_block_mean"]


def psf_to_otf(psf: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """PSF -> OTF: zero-pad to `shape`, roll center to origin, 2-D FFT.

    psf: (h, w), (B, h, w), or (B, h, w, 1) spatial kernel (sums to 1).
    Returns complex64 (..., H, W) with H, W = shape.

    The trailing singleton is only treated as a channel axis on 4-D input —
    a 3-D (B, h, 1) batch of 1-pixel-wide kernels is a legitimate PSF batch,
    not a channeled 2-D kernel (shape-based squeezing on ndim<4 would
    misparse it and build a garbage OTF).
    """
    if psf.ndim == 4 and psf.shape[-1] == 1:
        psf = psf[..., 0]
    h, w = psf.shape[-2:]
    H, W = shape
    pad = [(0, 0)] * (psf.ndim - 2) + [(0, H - h), (0, W - w)]
    otf = jnp.pad(psf.astype(jnp.float32), pad)
    otf = jnp.roll(otf, (-(h // 2), -(w // 2)), axis=(-2, -1))
    return jnp.fft.fft2(otf, axes=(-2, -1))


def upsample_zeros(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S^T y: zero-filling sf-fold upsampler, NHWC (reference ``upsample``)."""
    if sf == 1:
        return x
    b, h, w, c = x.shape
    z = jnp.zeros((b, h, sf, w, sf, c), x.dtype)
    z = z.at[:, :, 0, :, 0, :].set(x)
    return z.reshape(b, h * sf, w * sf, c)


def downsample_strided(x: jnp.ndarray, sf: int) -> jnp.ndarray:
    """S x: keep the upper-left pixel of each sf x sf block, NHWC."""
    return x if sf == 1 else x[:, ::sf, ::sf, :]


def alias_block_mean(a: jnp.ndarray, sf: int) -> jnp.ndarray:
    """Mean over the sf x sf coarse blocks (reference ``splits``+mean).

    a: (B, H, W, C) -> (B, H/sf, W/sf, C).  The reference chunks the H and W
    axes into sf contiguous blocks and averages them (``utils_sisr.py:9-19``);
    as a reshape this is mean over the two block axes.
    """
    if sf == 1:
        return a
    b, H, W, c = a.shape
    return a.reshape(b, sf, H // sf, sf, W // sf, c).mean(axis=(1, 3))


class ProxOperator(NamedTuple):
    """Per-batch precomputed spectra reused across all sampler steps."""

    FB: jnp.ndarray    # (B, H, W, C) complex64 — OTF of k at HR size
    FBC: jnp.ndarray   # conj(FB)
    F2B: jnp.ndarray   # |FB|^2 (real)
    FBFy: jnp.ndarray  # FBC * FFT(S^T y)
    sf: int


def precompute(y: jnp.ndarray, k: jnp.ndarray, sf: int) -> ProxOperator:
    """Precompute (FB, FBC, F2B, FBFy) from LR observation y and kernel k.

    y: (B, h, w, C) in [0,1];  k: (B, kh, kw) or (B, kh, kw, 1).
    Parity with reference ``pre_calculate`` (``utils_sisr.py:78-95``).
    """
    y = y.astype(jnp.float32)
    h, w = y.shape[1:3]
    FB = psf_to_otf(k, (h * sf, w * sf))[:, :, :, None]          # (B,H,W,1)
    FB = jnp.broadcast_to(FB, FB.shape[:3] + (y.shape[-1],))
    FBC = jnp.conj(FB)
    F2B = jnp.abs(FB) ** 2
    STy = upsample_zeros(y, sf)
    FBFy = FBC * jnp.fft.fft2(STy, axes=(1, 2))
    return ProxOperator(FB=FB, FBC=FBC, F2B=F2B, FBFy=FBFy, sf=sf)


def prox_solve(x0: jnp.ndarray, op: ProxOperator, tau: jnp.ndarray) -> jnp.ndarray:
    """Exact prox solve (reference ``data_solution``, ``utils_sisr.py:65-75``).

    x0: (B, H, W, C) in [0,1] (fp32); tau: scalar or (B,) rho_t weight.
    Returns the minimizer of ||y - SHx||^2 + tau||x - x0||^2.
    """
    x0 = x0.astype(jnp.float32)
    tau = jnp.asarray(tau, jnp.float32)
    tau_b = tau.reshape((-1,) + (1,) * 3) if tau.ndim else tau
    sf = op.sf
    # Cancellation-free reformulation of the reference's distinct-block solve
    # (``utils_sisr.py:65-75``), algebraically identical but WITHOUT the /tau
    # that amplifies fp32 rounding ~1/rho_t-fold at early-trajectory taus:
    # since S^T y's spectrum is alias-periodic (zero-fill upsampling),
    # mean_blocks(FB * FBFy) = invW * FBFy per block, and the Woodbury form
    # collapses to
    #     FX = F0 + (FBFy - FBC * tile(mean_blocks(FB * F0))/...) /
    #          (tile(invW) + tau)
    # which reduces to (FBFy + tau*F0)/(|FB|^2 + tau) at sf=1.
    F0 = jnp.fft.fft2(x0, axes=(1, 2))
    if sf == 1:
        FX = (op.FBFy + tau_b * F0) / (op.F2B + tau_b)
        return jnp.real(jnp.fft.ifft2(FX, axes=(1, 2)))
    invW = alias_block_mean(op.F2B, sf)
    FBF0_mean = alias_block_mean(op.FB * F0, sf)
    denom = jnp.tile(invW, (1, sf, sf, 1)) + tau_b
    FX = F0 + (op.FBFy - op.FBC * jnp.tile(FBF0_mean, (1, sf, sf, 1))) / denom
    return jnp.real(jnp.fft.ifft2(FX, axes=(1, 2)))
