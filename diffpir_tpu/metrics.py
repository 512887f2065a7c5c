"""Quality metrics facade: PSNR / PSNR-Y / SSIM (+ optional LPIPS).

PSNR/SSIM/luma implementations live in ``diffpir_tpu.utils.image`` (pinned to
reference ``utils/utils_image.py:584-661``); this module adds the LPIPS hook
the reference exposes via the external ``lpips`` pip package
(``main_ddpir.py:543-544``).  LPIPS needs pretrained VGG weights; when the
package (or its weights) are unavailable, ``make_lpips`` returns None and
callers skip the metric — matching the reference's lazy optional import.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import numpy as np

from diffpir_tpu.utils.image import psnr, psnr_batch, rgb_to_y_batch, ssim

__all__ = ["psnr", "psnr_batch", "ssim", "rgb_to_y_batch", "psnr_y_batch",
           "make_lpips", "lpips_from_weights", "fid_from_weights",
           "frechet_distance", "FidScorer"]


def __getattr__(name):
    # FID lives in diffpir_tpu.inception (InceptionV3 transcription is large);
    # re-exported here so the metric facade stays the single import point.
    if name in ("fid_from_weights", "frechet_distance", "FidScorer",
                "inception_pool3_from_weights", "feature_stats"):
        import diffpir_tpu.inception as _inc

        return getattr(_inc, name)
    raise AttributeError(name)

log = logging.getLogger(__name__)


def psnr_y_batch(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on the BT.601 luma channel, inputs (B,H,W,3) in [-1,1]."""
    return psnr_batch(rgb_to_y_batch(a), rgb_to_y_batch(b))


def make_lpips(net: str = "vgg",
               weights_path: Optional[str] = None) -> Optional[Callable]:
    """Return lpips(a, b) -> float on (B,H,W,3) [-1,1] arrays, or None.

    Two paths:
      * ``weights_path`` given — build a self-contained JAX VGG16-LPIPS graph
        from a local weights file (no network, no ``lpips``/``torchvision``
        packages needed); see ``lpips_from_weights`` for the file format.
        Raises on a malformed file (an explicitly provided path failing is an
        error, not a silent metric drop).
      * default — the torch ``lpips`` package on host when importable (the
        reference's lazy import, ``main_ddpir.py:543-544``); constructing it
        downloads VGG weights, so in a no-egress deployment this returns None
        and callers skip the metric.
    """
    if weights_path is not None:
        return lpips_from_weights(weights_path)
    try:
        import lpips  # type: ignore
        import torch

        # constructing LPIPS downloads/loads the backbone weights — in a
        # no-egress environment this raises even when the package imports
        loss_fn = lpips.LPIPS(net=net)
    except Exception:
        log.info("lpips unavailable (package or weights) — LPIPS disabled")
        return None

    def compute(a: np.ndarray, b: np.ndarray) -> float:
        with torch.no_grad():
            ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).astype(np.float32))
            tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)).astype(np.float32))
            return float(loss_fn(ta, tb).mean())

    return compute


# ---------------------------------------------------------------------------
# LPIPS from local weights (no lpips/torchvision dependency)
# ---------------------------------------------------------------------------

# VGG16 `features` conv layer indices (torchvision state_dict naming) and the
# pooling positions; LPIPS-vgg taps the activations after relu1_2, relu2_2,
# relu3_3, relu4_3, relu5_3 (the last relu of each stage).
_VGG16_CONVS = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_VGG16_STAGES = ((0, 2), (5, 7), (10, 12, 14), (17, 19, 21), (24, 26, 28))

# lpips.ScalingLayer constants (input in [-1,1] -> ImageNet-ish whitening)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def lpips_from_weights(weights_path: str) -> Callable:
    """Build LPIPS(vgg) as a pure JAX function from a local weights file.

    The reference computes LPIPS through the ``lpips`` pip package whose
    constructor *downloads* the VGG16 backbone (``main_ddpir.py:543-544``) —
    unusable in no-egress deployments.  This builds the same graph (VGG16
    features -> per-stage unit-normalized activation differences -> learned
    1x1 "lin" weights -> spatial mean -> sum over stages) from weights the
    caller provides on disk.

    Accepted file contents (``.npz`` or a torch ``.pt`` state_dict; keys may
    be merged from the two upstream files):
      * ``features.{i}.weight`` / ``features.{i}.bias`` for the 13 VGG16 conv
        layers i in {0,2,5,7,10,12,14,17,19,21,24,26,28} (torchvision
        ``vgg16(weights=...).features.state_dict()`` naming), torch OIHW
        layout, and
      * ``lin{k}.model.1.weight`` for k in 0..4 (the ``lpips`` package's
        learned linear heads, shape (1, C_k, 1, 1)).

    Returns ``compute(a, b) -> float`` on (B,H,W,3) [-1,1] numpy arrays
    (mean LPIPS over the batch), jit-compiled on first call.
    """
    import jax
    import jax.numpy as jnp

    flat = _load_weight_file(weights_path)

    convs = []
    for i in _VGG16_CONVS:
        try:
            w, b = flat[f"features.{i}.weight"], flat[f"features.{i}.bias"]
        except KeyError as e:
            raise ValueError(
                f"{weights_path}: missing VGG16 key {e} (expected torchvision "
                f"features.* naming; see lpips_from_weights docstring)") from e
        if w.ndim != 4 or w.shape[2:] != (3, 3):
            raise ValueError(f"{weights_path}: features.{i}.weight has shape "
                             f"{w.shape}, expected (O,I,3,3)")
        # torch OIHW -> XLA HWIO
        convs.append((jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                      jnp.asarray(b.reshape(1, 1, 1, -1))))
    lins = []
    for k in range(5):
        key = f"lin{k}.model.1.weight"
        if key not in flat:
            raise ValueError(f"{weights_path}: missing LPIPS head {key!r}")
        lins.append(jnp.asarray(flat[key].reshape(-1).astype(np.float32)))

    shift = jnp.asarray(flat.get("scaling_layer.shift",
                                 _LPIPS_SHIFT).reshape(1, 1, 1, 3))
    scale = jnp.asarray(flat.get("scaling_layer.scale",
                                 _LPIPS_SCALE).reshape(1, 1, 1, 3))
    conv_of = {i: c for i, c in zip(_VGG16_CONVS, convs)}

    def _features(x):
        """x: (B,H,W,3) whitened; returns the 5 tapped stage activations."""
        taps = []
        for s, stage in enumerate(_VGG16_STAGES):
            if s:  # maxpool 2x2/2 between stages
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                    "VALID")
            for i in stage:
                w, b = conv_of[i]
                x = jax.lax.conv_general_dilated(
                    x, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                x = jax.nn.relu(x + b)
            taps.append(x)
        return taps

    @jax.jit
    def _lpips(a, b):
        fa = _features((a - shift) / scale)
        fb = _features((b - shift) / scale)
        total = 0.0
        for ta, tb, lin in zip(fa, fb, lins):
            # unit-normalize over channels (lpips normalize_tensor, eps 1e-10)
            na = ta * jax.lax.rsqrt(jnp.sum(ta * ta, -1, keepdims=True) + 1e-10)
            nb = tb * jax.lax.rsqrt(jnp.sum(tb * tb, -1, keepdims=True) + 1e-10)
            d = (na - nb) ** 2
            total = total + jnp.mean(jnp.sum(d * lin, -1), axis=(1, 2))
        return total  # (B,)

    def compute(a: np.ndarray, b: np.ndarray) -> float:
        a = jnp.asarray(np.asarray(a, np.float32))
        b = jnp.asarray(np.asarray(b, np.float32))
        return float(np.mean(np.asarray(_lpips(a, b))))

    return compute


def _load_weight_file(path: str) -> dict:
    """npz or torch .pt state_dict -> {key: np.ndarray} (fp32)."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: np.asarray(z[k], np.float32) for k in z.files}
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().numpy(), np.float32)
            for k, v in sd.items()}
