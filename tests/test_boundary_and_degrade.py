"""Boundary tools, kernel factories, shift_pixel, shepard init vs reference."""

import numpy as np
import pytest

from diffpir_tpu.ops import boundary
from diffpir_tpu.ops.degrade import (
    fspecial, fspecial_gaussian, get_rho_sigma, motion_psf, shepard_initialize,
    shift_pixel, trajectory_psf,
)
from tests.conftest import add_reference_to_path, reference_available


def _ref_deblur():
    add_reference_to_path()
    import importlib

    return importlib.import_module("utils.utils_deblur")


def test_psf2otf_matches_device_path_and_roundtrips():
    """The reference's numpy psf2otf cannot run under numpy 2 (np.alltrue);
    validate against the torch-verified device path (ops.fft_prox.psf_to_otf)
    and by otf2psf round-trip instead."""
    import jax.numpy as jnp

    from diffpir_tpu.ops.fft_prox import psf_to_otf

    rng = np.random.default_rng(0)
    k = rng.random((5, 7))
    ours = boundary.psf2otf(k, (16, 20))
    dev = np.asarray(psf_to_otf(jnp.asarray(k, jnp.float32)[None], (16, 20)))[0]
    np.testing.assert_allclose(ours, dev, atol=1e-5)
    psf_back = boundary.otf2psf(ours, (5, 7))
    np.testing.assert_allclose(psf_back, k, atol=1e-10)


def test_opt_fft_size_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    rd = _ref_deblur()
    n = [111, 255, 256, 500, 1023]
    np.testing.assert_array_equal(boundary.opt_fft_size(n), rd.opt_fft_size(n))


def test_wrap_boundary_liu_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    rd = _ref_deblur()
    rng = np.random.default_rng(1)
    img = rng.random((32, 32))
    target = (40, 44)
    ref = rd.wrap_boundary_liu(img.copy(), target)
    ours = boundary.wrap_boundary_liu(img.copy(), target)
    np.testing.assert_allclose(ours, ref, atol=1e-8)
    # 3-channel
    img3 = rng.random((32, 32, 3))
    np.testing.assert_allclose(boundary.wrap_boundary_liu(img3.copy(), target),
                               rd.wrap_boundary_liu(img3.copy(), target),
                               atol=1e-8)


def test_fspecial_closed_forms():
    """Reference fspecial_gaussian can't run under modern scipy (scipy.finfo);
    check MATLAB closed forms directly."""
    g = fspecial("gaussian", 7, 1.5)
    assert g.sum() == pytest.approx(1.0)
    assert g[3, 3] == g.max()
    # separable gaussian: ratio test against exp formula
    assert g[3, 4] / g[3, 3] == pytest.approx(np.exp(-1 / (2 * 1.5**2)))
    lap = fspecial("laplacian", 0.2)
    assert lap.sum() == pytest.approx(0.0, abs=1e-12)
    assert lap[1, 1] == pytest.approx(-4 / 1.2)
    np.testing.assert_allclose(fspecial("average", 5), np.full((5, 5), 1 / 25))
    np.testing.assert_array_equal(fspecial("prewitt"),
                                  [[1, 1, 1], [0, 0, 0], [-1, -1, -1]])
    np.testing.assert_array_equal(fspecial("sobel"),
                                  [[1, 2, 1], [0, 0, 0], [-1, -2, -1]])


def test_get_rho_sigma_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    from utils.utils_inpaint import get_rho_sigma as ref_grs

    r_ref, s_ref = ref_grs(0.01, 20, 2.55)
    r_ours, s_ours = get_rho_sigma(0.01, 20, 2.55)
    np.testing.assert_allclose(r_ours, r_ref, rtol=1e-12)
    np.testing.assert_allclose(s_ours, s_ref, rtol=1e-12)


def test_shift_pixel_analytic():
    """scipy removed interp2d so the reference shift_pixel can't run; a linear
    ramp shifts exactly under bilinear interpolation (interior points)."""
    h = w = 16
    ramp = np.add.outer(np.arange(h, dtype=np.float64),
                        np.arange(w, dtype=np.float64))
    sf = 3
    out = shift_pixel(ramp.copy(), sf)  # shift = (sf-1)/2 = 1.0 in both axes
    np.testing.assert_allclose(out[:-1, :-1], ramp[:-1, :-1] + 2.0, atol=1e-10)
    # border clipped to last sample
    assert out[-1, -1] == ramp[-1, -1]
    # 3-channel path
    out3 = shift_pixel(np.repeat(ramp[:, :, None], 3, axis=2), sf)
    np.testing.assert_allclose(out3[..., 1][:-1, :-1], ramp[:-1, :-1] + 2.0,
                               atol=1e-10)


def test_shepard_fills_all_unobserved():
    rng = np.random.default_rng(3)
    img = rng.random((24, 24, 3)) * 255
    mask = rng.random((24, 24)) > 0.5
    out = shepard_initialize(img * mask[:, :, None], mask, window=9)
    # observed pixels unchanged; unobserved pixels within data range
    np.testing.assert_allclose(out[mask], (img * mask[:, :, None])[mask])
    assert out[~mask].min() >= 0 and out[~mask].max() <= 255.01
    assert (out[~mask] > 0).mean() > 0.99  # actually filled


def test_kernel_generators_normalized():
    k1 = trajectory_psf(25, np.random.default_rng(0))
    k2 = motion_psf(31, 0.5, np.random.default_rng(1))
    k3 = fspecial_gaussian(25, 3.0)
    for k in (k1, k2, k3):
        assert k.sum() == pytest.approx(1.0, rel=1e-6)
        assert (k >= 0).all()
    assert k2.shape == (31, 31)


def test_motion_psf_statistics():
    """Distributional properties of the motionblur.Kernel port.

    No recorded sample set from the original pip package exists in this
    environment (zero egress), so the test pins the properties the algorithm
    guarantees by construction: center-of-mass centering, reproducibility,
    intensity-controlled curvature (low intensity => near-linear path =>
    strongly anisotropic second moment), and per-seed diversity.
    """
    ks = 61
    rng = np.random.default_rng

    # reproducibility + diversity
    np.testing.assert_array_equal(motion_psf(ks, 0.5, rng(3)),
                                  motion_psf(ks, 0.5, rng(3)))
    assert not np.allclose(motion_psf(ks, 0.5, rng(3)), motion_psf(ks, 0.5, rng(4)))

    def com_and_aniso(k):
        ii, jj = np.mgrid[0:k.shape[0], 0:k.shape[1]]
        ci, cj = (k * ii).sum(), (k * jj).sum()
        di, dj = ii - ci, jj - cj
        cov = np.array([[(k * di * di).sum(), (k * di * dj).sum()],
                        [(k * di * dj).sum(), (k * dj * dj).sum()]])
        ev = np.sort(np.linalg.eigvalsh(cov))
        return (ci, cj), ev[0] / max(ev[1], 1e-12)

    # the path is shifted so its center of mass sits at the kernel center
    # (rasterization quantizes it by a few px)
    ratios_low, ratios_high = [], []
    for seed in range(12):
        k_low = motion_psf(ks, 0.05, rng(100 + seed))
        k_high = motion_psf(ks, 0.95, rng(100 + seed))
        for k in (k_low, k_high):
            (ci, cj), _ = com_and_aniso(k)
            assert abs(ci - (ks - 1) / 2) < 6 and abs(cj - (ks - 1) / 2) < 6
        ratios_low.append(com_and_aniso(k_low)[1])
        ratios_high.append(com_and_aniso(k_high)[1])
    # intensity ~0 => nearly straight line => tiny min/max eigenvalue ratio;
    # high intensity curls the path => fatter second moment on average
    assert np.median(ratios_low) < 0.05
    assert np.median(ratios_high) > 2 * np.median(ratios_low)


def test_solve_min_laplacian_degenerate_shapes_match_reference():
    """Single-interior-row/column inputs take the reference's special DST
    axis/normalization branches (utils_deblur.py:403-432) — folding them into
    the general case diverges by ~0.4 max abs."""
    if not reference_available():
        pytest.skip("reference not mounted")
    rd = _ref_deblur()
    rng = np.random.default_rng(2)
    for shape in [(3, 10), (10, 3), (3, 3), (8, 8), (4, 17)]:
        b = rng.random(shape)
        np.testing.assert_allclose(
            boundary.solve_min_laplacian(b.copy()),
            rd.solve_min_laplacian(b.copy()), atol=1e-10,
            err_msg=str(shape))


def test_make_mask_both_mixes_box_and_random_families():
    """mask_type 'both' = per-image fair coin between box and random.

    The reference declares 'both' valid (utils_inpaint.py:95) but its
    __call__ has no branch for it and returns None (utils_inpaint.py:127-137)
    — here it must produce a REAL mask from one of the two families, choose
    per-image (different seeds hit both families), and stay seed-reproducible.
    """
    from diffpir_tpu.ops.degrade import make_mask

    def family(m):
        # a box mask's zero set is one solid axis-aligned rectangle; a
        # random mask's is ~50% scattered pixels
        holes = (m == 0)
        rows, cols = np.where(holes)
        rect = (rows.max() - rows.min() + 1) * (cols.max() - cols.min() + 1)
        return "box" if rect == holes.sum() else "random"

    seen = set()
    for seed in range(12):
        m = make_mask("both", image_size=64, mask_len_range=(16, 17),
                      mask_prob_range=(0.5, 0.5), margin=(4, 4),
                      rng=np.random.default_rng(seed))
        assert m.shape == (64, 64) and set(np.unique(m)) <= {0.0, 1.0}
        seen.add(family(m))
        # reproducible: same seed -> same mask
        m2 = make_mask("both", image_size=64, mask_len_range=(16, 17),
                       mask_prob_range=(0.5, 0.5), margin=(4, 4),
                       rng=np.random.default_rng(seed))
        np.testing.assert_array_equal(m, m2)
    assert seen == {"box", "random"}, f"only saw {seen} in 12 draws"
