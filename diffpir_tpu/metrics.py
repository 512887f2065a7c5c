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
           "make_lpips"]

log = logging.getLogger(__name__)


def psnr_y_batch(a: np.ndarray, b: np.ndarray) -> float:
    """PSNR on the BT.601 luma channel, inputs (B,H,W,3) in [-1,1]."""
    return psnr_batch(rgb_to_y_batch(a), rgb_to_y_batch(b))


def make_lpips(net: str = "vgg") -> Optional[Callable]:
    """Return lpips(a, b) -> float on (B,H,W,3) [-1,1] arrays, or None.

    Uses the torch ``lpips`` package on host (CPU) when importable — the metric
    runs once per batch outside the jitted restore path, so a host callback is
    the right cost model; a JAX port would need the same unavailable weights.
    """
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
