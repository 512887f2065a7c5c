"""Resizer vs both reference MATLAB-imresize implementations."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

import jax.numpy as jnp

from diffpir_tpu.ops.resize import Resizer2D, resize2d, resize_matrix


def test_resize_matrix_rows_sum_to_one():
    for (n, m) in [(256, 64), (64, 256), (100, 33)]:
        R = resize_matrix(n, m, m / n)
        np.testing.assert_allclose(R.sum(axis=1), np.ones(m), atol=1e-5)


@pytest.mark.parametrize("sf", [2, 3, 4])
def test_downscale_matches_reference_resizer(sf):
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils.utils_resizer import Resizer

    rng = np.random.default_rng(0)
    x = rng.random((1, 3, 16 * sf, 16 * sf)).astype(np.float32)
    ref = Resizer(x.shape, 1 / sf)(torch.from_numpy(x)).numpy()
    ours = np.asarray(resize2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 1 / sf))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


def test_upscale_matches_reference_resizer():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils.utils_resizer import Resizer

    rng = np.random.default_rng(1)
    x = rng.random((1, 3, 16, 16)).astype(np.float32)
    ref = Resizer(x.shape, 4)(torch.from_numpy(x)).numpy()
    ours = np.asarray(resize2d(jnp.asarray(x.transpose(0, 2, 3, 1)), 4.0))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-4)


@pytest.mark.parametrize("sf", [2, 4])
def test_downscale_matches_reference_imresize_np(sf):
    """The SR 'blur' degradation path uses utils_image.imresize_np (main_ddpir.py:89)."""
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import sys
    import types

    # utils_image imports cv2/torchvision at top level; only imresize_np is used here
    sys.modules.setdefault("cv2", types.ModuleType("cv2"))
    tv = types.ModuleType("torchvision")
    tv_utils = types.ModuleType("torchvision.utils")
    tv_utils.make_grid = lambda *a, **k: None
    tv.utils = tv_utils
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tv_utils)
    from utils import utils_image as util

    rng = np.random.default_rng(2)
    x = rng.random((16 * sf, 16 * sf, 3)).astype(np.float64)
    ref = util.imresize_np(x, 1 / sf)
    ours = np.asarray(resize2d(jnp.asarray(x[None].astype(np.float32)), 1 / sf))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resizer2d_precompiled_equivalent():
    rng = np.random.default_rng(3)
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    r = Resizer2D((32, 32), 0.25)
    np.testing.assert_allclose(np.asarray(r(jnp.asarray(x))),
                               np.asarray(resize2d(jnp.asarray(x), 0.25)),
                               atol=1e-6)
