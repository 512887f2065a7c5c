from diffpir_tpu.ops.fft_prox import (
    ProxOperator, precompute, prox_solve, psf_to_otf,
    upsample_zeros, downsample_strided, alias_block_mean,
)
from diffpir_tpu.ops.resize import Resizer2D, resize2d, resize_matrix

__all__ = [
    "ProxOperator", "precompute", "prox_solve", "psf_to_otf",
    "upsample_zeros", "downsample_strided", "alias_block_mean",
    "Resizer2D", "resize2d", "resize_matrix",
]
