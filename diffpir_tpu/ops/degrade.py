"""Degradation operators: blur kernels, masks, noise, and forward models.

Task-physics parity with the reference:

  * ``fspecial_gaussian``      == ``utils/utils_deblur.py:488-499``
  * ``gaussian_psf``           == DPS ``Blurkernel`` gaussian init
                                  (``utils_deblur.py:658-666``: impulse through
                                  ``scipy.ndimage.gaussian_filter``)
  * ``motion_psf``             == port of the external ``motionblur.Kernel``
                                  pip package (``utils_deblur.py:7,691-693``,
                                  ``README.md:40``) — same algorithm, numpy
                                  Generator RNG (bit-exactness across RNG
                                  backends is impossible; moments match).
  * ``trajectory_psf``         == trajectory-synthesis family
                                  (``utils_deblur.py:556-632``).
  * ``box_mask``/``random_mask``/``make_mask`` == ``utils/utils_inpaint.py:67-137``
  * ``classical_degradation``  == ``utils/utils_sisr.py:100-114``
  * ``blur_circular``          == ``scipy.ndimage.convolve(..., mode='wrap')``
                                  (``main_ddpir.py:99``) — exact circular
                                  convolution, done spectrally on device.
  * ``blur_reflect``           == reflection-pad depthwise conv forward op
                                  (``main_ddpir.py:304-310``).

Kernel/mask synthesis is host-side numpy (it feeds the data pipeline and must
replicate the reference's numpy RNG streams for reproducibility); the forward
operators are jittable jnp functions.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import gaussian_filter
from scipy.signal import convolve2d

__all__ = [
    "fspecial_gaussian", "fspecial_laplacian", "fspecial_average",
    "fspecial_prewitt", "fspecial_sobel", "fspecial",
    "gaussian_psf", "motion_psf", "trajectory_psf",
    "box_mask", "random_mask", "make_mask", "shepard_initialize",
    "get_rho_sigma", "shift_pixel",
    "blur_circular", "blur_reflect", "classical_degradation", "add_awgn",
]


# ---------------------------------------------------------------------------
# Kernel synthesis (host-side numpy)
# ---------------------------------------------------------------------------

def fspecial_gaussian(hsize: int, sigma: float) -> np.ndarray:
    """MATLAB fspecial('gaussian'): truncated, normalized Gaussian."""
    siz = (hsize - 1) / 2.0
    y, x = np.mgrid[-siz:siz + 1, -siz:siz + 1]
    h = np.exp(-(x * x + y * y) / (2.0 * sigma * sigma))
    h[h < np.finfo(float).eps * h.max()] = 0
    s = h.sum()
    return h / s if s != 0 else h


def fspecial_laplacian(alpha: float) -> np.ndarray:
    """MATLAB fspecial('laplacian', alpha) (reference ``utils_deblur.py:502-508``)."""
    alpha = max(0.0, min(alpha, 1.0))
    h1 = alpha / (alpha + 1)
    h2 = (1 - alpha) / (alpha + 1)
    return np.array([[h1, h2, h1], [h2, -4 / (alpha + 1), h2], [h1, h2, h1]])


def fspecial_average(hsize: int = 3) -> np.ndarray:
    return np.ones((hsize, hsize)) / hsize**2


def fspecial_prewitt() -> np.ndarray:
    return np.array([[1, 1, 1], [0, 0, 0], [-1, -1, -1]], dtype=np.float64)


def fspecial_sobel() -> np.ndarray:
    return np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], dtype=np.float64)


def fspecial(filter_type: str, *args, **kwargs) -> np.ndarray:
    """MATLAB-style filter factory (reference ``utils_deblur.py:527-547``)."""
    table = {"gaussian": fspecial_gaussian, "laplacian": fspecial_laplacian,
             "average": fspecial_average, "prewitt": fspecial_prewitt,
             "sobel": fspecial_sobel}
    return table[filter_type](*args, **kwargs)


def get_rho_sigma(sigma: float = 2.55 / 255, iter_num: int = 15,
                  model_sigma2: float = 2.55):
    """DPIR rho/sigma log-schedule (reference ``utils_inpaint.py:15-25``)."""
    model_sigma1 = 49.0
    sigmas = np.logspace(np.log10(model_sigma1), np.log10(model_sigma2),
                         iter_num) / 255.0
    rhos = [(sigma**2) / (s**2) / 3 for s in sigmas]
    return rhos, sigmas


def shift_pixel(x: np.ndarray, sf: int, upper_left: bool = True) -> np.ndarray:
    """Half-pixel grid shift compensating classical sf-fold downsampling.

    Parity with reference ``utils_sisr.py:118-144`` (bilinear resample at
    coordinates shifted by (sf-1)/2, clipped at the border).
    """
    from scipy.interpolate import RegularGridInterpolator

    h, w = x.shape[:2]
    shift = (sf - 1) * 0.5
    xv, yv = np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64)
    x1 = np.clip(xv + (shift if upper_left else -shift), 0, w - 1)
    y1 = np.clip(yv + (shift if upper_left else -shift), 0, h - 1)
    yy, xx = np.meshgrid(y1, x1, indexing="ij")
    pts = np.stack([yy.ravel(), xx.ravel()], axis=1)

    def interp(ch):
        f = RegularGridInterpolator((yv, xv), ch, method="linear")
        return f(pts).reshape(h, w)

    if x.ndim == 2:
        return interp(x)
    out = x.copy().astype(np.float64)
    for c in range(x.shape[-1]):
        out[:, :, c] = interp(x[:, :, c].astype(np.float64))
    return out


def shepard_initialize(image: np.ndarray, measurement_mask: np.ndarray,
                       window: int = 5, p: int = 2) -> np.ndarray:
    """Inverse-distance-weighted (Shepard) inpainting initialization.

    Vectorized equivalent of reference ``utils_inpaint.py:28-63`` (which loops
    per pixel): each unobserved pixel becomes the IDW average of observed
    pixels in its (window x window) neighborhood, weights 1/(di^p + dj^p).
    """
    from scipy.signal import convolve2d

    img = image.astype(np.float64)
    if img.ndim == 2:
        img = img[:, :, None]
    m = measurement_mask.astype(np.float64)
    wing = window // 2

    # weight stencil over offsets; center excluded (distance 0 is unobserved
    # anyway when interpolation is needed)
    ii, jj = np.meshgrid(np.arange(-wing, wing + 1), np.arange(-wing, wing + 1),
                         indexing="ij")
    wgt = np.zeros_like(ii, dtype=np.float64)
    nz = (ii != 0) | (jj != 0)
    wgt[nz] = 1.0 / (np.abs(ii[nz]) ** p + np.abs(jj[nz]) ** p)

    denom = convolve2d(m, wgt, mode="same")
    out = img.copy()
    for c in range(img.shape[-1]):
        num = convolve2d(img[:, :, c] * m, wgt, mode="same")
        fill = np.divide(num, denom, out=np.zeros_like(num), where=denom > 0)
        out[:, :, c] = np.where(m > 0, img[:, :, c], fill)
    return out if image.ndim == 3 else out[:, :, 0]


def gaussian_psf(kernel_size: int, std: float) -> np.ndarray:
    """Impulse response of scipy's gaussian_filter (DPS Blurkernel 'gaussian')."""
    n = np.zeros((kernel_size, kernel_size))
    n[kernel_size // 2, kernel_size // 2] = 1.0
    return gaussian_filter(n, sigma=std)


def trajectory_psf(h: int = 37, rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random camera-shake kernel from a 3-D random trajectory.

    Same generative family as reference ``blurkernel_synthesis`` /
    ``kernelFromTrajectory`` / ``randomTrajectory`` (``utils_deblur.py:556-623``):
    integrate random rotational+translational impulses, histogram the projected
    path, smooth with a 3x3 Gaussian, center-pad to (h, h).
    """
    rng = rng or np.random.default_rng()
    T = 150
    x = np.zeros((3, T))
    v = rng.standard_normal((3, T))
    r = np.zeros((3, T))
    trr = 2 * math.pi / T
    for t in range(1, T):
        f_rot = rng.standard_normal(3) / (t + 1) + r[:, t - 1]
        f_trans = rng.standard_normal(3) / (t + 1)
        r[:, t] = r[:, t - 1] + trr * f_rot
        v[:, t] = v[:, t - 1] + f_trans
        st = _rot3d(v[:, t], r[:, t])
        x[:, t] = x[:, t - 1] + st

    k = None
    while k is None:
        k = _kernel_from_trajectory(x, rng)
    pad0 = (h - k.shape[0]) // 2
    pad1 = (h - k.shape[1]) // 2
    if pad0 < 0 or pad1 < 0:
        k = k[:h, :h]
    else:
        k = np.pad(k, ((pad0, h - k.shape[0] - pad0), (pad1, h - k.shape[1] - pad1)))
    return k / k.sum()


def _rot3d(x: np.ndarray, r: np.ndarray) -> np.ndarray:
    cx, sx = math.cos(r[0]), math.sin(r[0])
    cy, sy = math.cos(r[1]), math.sin(r[1])
    cz, sz = math.cos(r[2]), math.sin(r[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx @ x


def _kernel_from_trajectory(x: np.ndarray, rng: np.random.Generator) -> Optional[np.ndarray]:
    h = 5 - math.log(rng.uniform()) / 0.15
    h = int(round(min(h, 27.0)))
    h = h + 1 - h % 2
    w = h
    k = np.zeros((h, w))
    xmin, xmax = x[0].min(), x[0].max()
    ymin, ymax = x[1].min(), x[1].max()
    xthr = np.arange(xmin, xmax, (xmax - xmin) / w)
    ythr = np.arange(ymin, ymax, (ymax - ymin) / h)
    for i in range(1, xthr.size):
        for j in range(1, ythr.size):
            idx = ((x[0] >= xthr[i - 1]) & (x[0] < xthr[i]) &
                   (x[1] >= ythr[j - 1]) & (x[1] < ythr[j]))
            k[i - 1, j - 1] = idx.sum()
    if k.sum() == 0:
        return None
    k = k / k.sum()
    k = convolve2d(k, fspecial_gaussian(3, 1), "same")
    return k / k.sum()


def motion_psf(kernel_size: int, intensity: float = 0.5,
               rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random motion-blur PSF with an intensity knob in [0, 1].

    Port of the public ``motionblur.Kernel`` algorithm the reference imports
    (``utils/utils_deblur.py:7,691-693``, ``README.md:40``;
    LeviBorodenko/motionblur, MIT): intensity 0 gives near-linear motion,
    1 a highly curved path.  The pipeline:

      1. random step lengths on a 2x supersampled canvas — total path length
         ``0.75 * diag * (U(0,1) + U(0, intensity^2))``, individual steps
         ``Beta(1,30) * (1 - intensity + 0.1) * diag`` (short dense steps at
         high intensity, few long ones at low);
      2. step angles: first ~ U(-A, A) with ``A = U(0, intensity*pi)``;
         successors ``Triangular(0, intensity*A, A + 0.1)`` in magnitude,
         flipping sign vs the previous angle with probability
         ``Beta(2,20)`` ("jitter");
      3. path = cumsum of the complex increments, centered on its center of
         mass, randomly rotated by U(0, pi), shifted to the canvas center;
      4. rasterize: draw the polyline (width diag/150), Gaussian-blur
         (radius 0.01*diag), LANCZOS-downsample 2x to kernel_size, normalize.

    The reference passes ``intensity = kernel_std`` (0.5 for motion mode,
    ``main_ddpir.py:151``, ``main_ddpir_deblur.py:166``).
    """
    from PIL import Image, ImageDraw, ImageFilter

    rng = rng or np.random.default_rng()
    eps = 0.1
    intensity = float(np.clip(intensity, 0.0, 1.0))
    # supersampled canvas (downscaled at the end for anti-aliasing)
    sx = sy = 2 * kernel_size
    diagonal = (sx**2 + sy**2) ** 0.5

    # 1. step lengths
    max_path_len = 0.75 * diagonal * (rng.uniform() + rng.uniform(0, intensity**2))
    steps: list[float] = []
    while sum(steps) < max_path_len:
        step = rng.beta(1, 30) * (1 - intensity + eps) * diagonal
        if step < max_path_len:
            steps.append(step)
    num_steps = len(steps)

    # 2. step angles
    max_angle = rng.uniform(0, intensity * math.pi)
    jitter = rng.beta(2, 20)
    angles = [rng.uniform(-max_angle, max_angle)]
    while len(angles) < num_steps:
        angle = rng.triangular(0, intensity * max_angle, max_angle + eps)
        sign = -np.sign(angles[-1]) if rng.uniform() < jitter else np.sign(angles[-1])
        angles.append(angle * (sign if sign != 0 else 1.0))

    # 3. complex path, COM-centered, randomly rotated
    incr = np.asarray(steps) * np.exp(1j * np.asarray(angles[:num_steps]))
    path = np.cumsum(incr) if num_steps else np.zeros(1, complex)
    path = path - path.mean()
    path = path * np.exp(1j * rng.uniform(0, math.pi))
    path = path + (sx + 1j * sy) / 2

    # 4. rasterize on the supersized canvas, blur, downsample, normalize
    img = Image.new("RGB", (sx, sy))
    ImageDraw.Draw(img).line([(p.real, p.imag) for p in path],
                             fill=(255, 255, 255), width=int(diagonal / 150))
    img = img.filter(ImageFilter.GaussianBlur(radius=int(diagonal * 0.01)))
    img = img.resize((kernel_size, kernel_size),
                     resample=Image.LANCZOS).convert("L")
    k = np.asarray(img, dtype=np.float32).copy()
    k = np.maximum(k, 0.0)  # LANCZOS ringing can go slightly negative pre-L
    if k.sum() <= 0:  # degenerate path fell outside the canvas — delta PSF
        k[kernel_size // 2, kernel_size // 2] = 1.0
    return k / k.sum()


# ---------------------------------------------------------------------------
# Masks (host-side numpy; reference utils_inpaint.py:67-137)
# ---------------------------------------------------------------------------

def box_mask(image_size=256, mask_len_range=(128, 129), margin=(16, 16),
             rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random square zero-box mask, (H, W) float in {0,1}. 1 = observed.

    image_size: int (square) or (H, W) — the RNG draw order is unchanged for
    square inputs, preserving per-seed reproducibility.
    """
    rng = rng or np.random.default_rng()
    H, W = ((image_size, image_size) if np.isscalar(image_size) else image_size)
    lo, hi = int(mask_len_range[0]), int(mask_len_range[1])
    h = int(rng.integers(lo, hi))
    w = int(rng.integers(lo, hi))
    mh, mw = margin
    # max(..) keeps the exactly-fitting case (H == h + 2*mh) placeable at the
    # margin instead of raising low >= high (the reference would crash too)
    t = int(rng.integers(mh, max(H - mh - h, mh + 1)))
    l = int(rng.integers(mw, max(W - mw - w, mw + 1)))
    mask = np.ones((H, W), np.float32)
    mask[t:t + h, l:l + w] = 0.0
    return mask


def random_mask(image_size=256, mask_prob_range=(0.5, 0.5),
                rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Random-pixel dropout mask, same prob for all channels."""
    rng = rng or np.random.default_rng()
    H, W = ((image_size, image_size) if np.isscalar(image_size) else image_size)
    prob = rng.uniform(*mask_prob_range)
    total = H * W
    mask = np.ones(total, np.float32)
    drop = rng.choice(total, int(total * prob), replace=False)
    mask[drop] = 0.0
    return mask.reshape(H, W)


def make_mask(mask_type: str, image_size=256, mask_len_range=(128, 129),
              mask_prob_range=(0.5, 0.5), margin=(16, 16),
              rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Dispatch over the reference's mask types (box|random|both|extreme).

    ``both`` = a per-image fair coin between the box and random families (the
    semantics the name implies).  The reference asserts 'both' as a valid
    type (``utils/utils_inpaint.py:95``) but its ``__call__`` has no branch
    for it and silently returns ``None`` (``utils_inpaint.py:127-137``) — a
    reference bug this implementation fixes rather than reproduces.
    """
    rng = rng or np.random.default_rng()
    if mask_type == "both":
        mask_type = "box" if rng.uniform() < 0.5 else "random"
    if mask_type == "random":
        return random_mask(image_size, mask_prob_range, rng)
    if mask_type == "box":
        return box_mask(image_size, mask_len_range, margin, rng)
    if mask_type == "extreme":
        return 1.0 - box_mask(image_size, mask_len_range, margin, rng)
    raise ValueError(f"unknown mask_type: {mask_type}")


# ---------------------------------------------------------------------------
# Forward operators (jittable)
# ---------------------------------------------------------------------------

def blur_circular(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Circular (wrap) convolution, NHWC x (B, kh, kw) kernels — spectral.

    Exactly matches ``scipy.ndimage.convolve(img, k, mode='wrap')`` for
    odd-sized kernels, which is the deblur degradation the FFT prox assumes
    (``main_ddpir.py:98-99``).
    """
    from diffpir_tpu.ops.fft_prox import psf_to_otf

    H, W = x.shape[1:3]
    otf = psf_to_otf(k, (H, W))[:, :, :, None]                # (B, H, W, 1)
    X = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    return jnp.real(jnp.fft.ifft2(X * otf, axes=(1, 2)))


def blur_reflect(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Reflection-padded depthwise correlation (DPS-style forward op).

    Matches ``ReflectionPad2d(ks//2)`` + grouped ``F.conv2d`` with a shared
    kernel per channel (``main_ddpir.py:304-310``); note torch conv2d is
    correlation (no kernel flip).  Kernels are per batch element (B, kh, kw) —
    the deblur pipeline synthesizes a distinct PSF per image.
    """
    ks = k.shape[-1]
    pad = ks // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    c = x.shape[-1]
    prec = jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None

    def one(xi, ki):
        kern = jnp.broadcast_to(ki[:, :, None, None], (ks, ks, 1, c)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            xi[None], kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
            precision=prec)[0]

    k = jnp.broadcast_to(k, (x.shape[0],) + k.shape[-2:])
    return jax.vmap(one)(xp, k)


def classical_degradation(x: np.ndarray, k: np.ndarray, sf: int = 3) -> np.ndarray:
    """Host-side blur (wrap) + strided subsample (reference ``utils_sisr.py:100-114``)."""
    from scipy import ndimage

    y = ndimage.convolve(x, np.expand_dims(k, axis=2), mode="wrap")
    return y[::sf, ::sf, ...]


def add_awgn(img01: np.ndarray, noise_level: float,
             rng: Optional[np.random.Generator] = None,
             legacy_seed: Optional[int] = None) -> np.ndarray:
    """AWGN with std `noise_level` in [0,1] domain.

    The reference adds N(0, 2*sigma) in the [-1,1] domain
    (``main_ddpir.py:112-114``) — identical to N(0, sigma) in [0,1].
    `legacy_seed` reproduces the reference's ``np.random.seed`` streams.
    """
    if legacy_seed is not None:
        np.random.seed(legacy_seed)
        x = img01 * 2 - 1
        x = x + np.random.normal(0, noise_level * 2, img01.shape)
        return x / 2 + 0.5
    rng = rng or np.random.default_rng()
    return img01 + rng.normal(0, noise_level, img01.shape)
