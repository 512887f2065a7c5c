"""FFT prox vs the reference torch implementation and vs a dense direct solve."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

import jax.numpy as jnp

from diffpir_tpu.ops.degrade import blur_circular, fspecial_gaussian
from diffpir_tpu.ops.fft_prox import (
    alias_block_mean, precompute, prox_solve, psf_to_otf,
    upsample_zeros, downsample_strided,
)


def _rand_kernel(rng, n=7):
    k = rng.random((n, n))
    return (k / k.sum()).astype(np.float32)


def test_psf_to_otf_matches_reference():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils import utils_sisr as sr

    rng = np.random.default_rng(0)
    k = _rand_kernel(rng)
    ref = sr.p2o(torch.from_numpy(k)[None, None], (16, 16)).numpy()[0, 0]
    ours = np.asarray(psf_to_otf(jnp.asarray(k)[None], (16, 16)))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_updown_sample_semantics():
    rng = np.random.default_rng(1)
    x = rng.random((2, 4, 4, 3)).astype(np.float32)
    up = np.asarray(upsample_zeros(jnp.asarray(x), 3))
    assert up.shape == (2, 12, 12, 3)
    np.testing.assert_array_equal(up[:, ::3, ::3, :], x)
    assert up.sum() == pytest.approx(x.sum(), rel=1e-6)
    np.testing.assert_array_equal(
        np.asarray(downsample_strided(jnp.asarray(up), 3)), x)


def test_alias_block_mean_matches_reference_splits():
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils import utils_sisr as sr

    rng = np.random.default_rng(2)
    a = rng.random((2, 3, 8, 8)).astype(np.float32)  # torch NCHW
    ref = torch.mean(sr.splits(torch.from_numpy(a), 2), dim=-1).numpy()
    ours = np.asarray(alias_block_mean(jnp.asarray(a.transpose(0, 2, 3, 1)), 2))
    np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


@pytest.mark.parametrize("sf", [1, 2, 3])
def test_prox_solve_matches_reference(sf):
    if not reference_available():
        pytest.skip("reference not mounted")
    add_reference_to_path()
    import torch
    from utils import utils_sisr as sr

    rng = np.random.default_rng(3)
    H = 12 * sf
    y = rng.random((2, 12, 12, 3)).astype(np.float32)
    x0 = rng.random((2, H, H, 3)).astype(np.float32)
    k = _rand_kernel(rng, 5)
    tau = 0.37

    yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
    kt = torch.from_numpy(np.broadcast_to(k, (2, 3, 5, 5)).copy())
    FB, FBC, F2B, FBFy = sr.pre_calculate(yt, kt, sf)
    ref = sr.data_solution(torch.from_numpy(x0.transpose(0, 3, 1, 2)),
                           FB, FBC, F2B, FBFy,
                           torch.tensor(tau), sf).numpy().transpose(0, 2, 3, 1)

    op = precompute(jnp.asarray(y), jnp.asarray(np.broadcast_to(k, (2, 5, 5)).copy()), sf)
    ours = np.asarray(prox_solve(jnp.asarray(x0), op, tau))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_prox_solve_is_the_exact_minimizer():
    """Dense linear-algebra check on a tiny image: the prox output must satisfy
    (H^T H + tau I) x = H^T y + tau x0 with H = circular blur + sf-subsample."""
    rng = np.random.default_rng(4)
    sf, n = 2, 8
    k = _rand_kernel(rng, 3)
    x0 = rng.random((1, n, n, 1)).astype(np.float32)
    xtrue = rng.random((1, n, n, 1)).astype(np.float32)
    y = np.asarray(downsample_strided(blur_circular(jnp.asarray(xtrue),
                                                    jnp.asarray(k)[None]), sf))

    # dense forward operator
    N = n * n
    Hmat = np.zeros((N // sf**2, N))
    for j in range(N):
        e = np.zeros((1, n, n, 1), np.float32)
        e.flat[j] = 1.0
        col = np.asarray(downsample_strided(
            blur_circular(jnp.asarray(e), jnp.asarray(k)[None]), sf))
        Hmat[:, j] = col.flatten()
    tau = 0.21
    A = Hmat.T @ Hmat + tau * np.eye(N)
    b = Hmat.T @ y.flatten() + tau * x0.flatten()
    direct = np.linalg.solve(A, b).reshape(1, n, n, 1)

    op = precompute(jnp.asarray(y), jnp.asarray(k)[None], sf)
    ours = np.asarray(prox_solve(jnp.asarray(x0), op, tau))
    np.testing.assert_allclose(ours, direct, atol=1e-4)


def test_sf1_stable_form_beats_general_form():
    """At tiny tau (early-trajectory rho), the sf=1 rearrangement must track the
    fp64 exact solution far better than the reference's /tau formulation."""
    rng = np.random.default_rng(7)
    n = 16
    k = fspecial_gaussian(5, 1.2).astype(np.float32)
    x0 = rng.random((1, n, n, 3)).astype(np.float32)
    y = np.asarray(blur_circular(jnp.asarray(rng.random((1, n, n, 3)).astype(np.float32)),
                                 jnp.asarray(k)[None]))
    tau = 1e-5

    # fp64 ground truth via the stable spectral formula
    otf = np.fft.fft2(np.roll(np.pad(k.astype(np.float64), ((0, n - 5), (0, n - 5))),
                              (-2, -2), axis=(0, 1)))[None, :, :, None]
    Fy = np.fft.fft2(y.astype(np.float64), axes=(1, 2))
    F0 = np.fft.fft2(x0.astype(np.float64), axes=(1, 2))
    exact = np.real(np.fft.ifft2((np.conj(otf) * Fy + tau * F0) /
                                 (np.abs(otf) ** 2 + tau), axes=(1, 2)))

    op = precompute(jnp.asarray(y), jnp.asarray(k)[None], 1)
    ours = np.asarray(prox_solve(jnp.asarray(x0), op, tau))
    # fp32 transcription of the reference's general-sf formula at sf=1
    FR = np.asarray(op.FBFy) + np.fft.fft2(tau * x0, axes=(1, 2)).astype(np.complex64)
    invWBR = (np.asarray(op.FB) * FR) / (np.asarray(op.F2B) + tau)
    FX = (FR - np.asarray(op.FBC) * invWBR) / tau
    ref_form = np.real(np.fft.ifft2(FX, axes=(1, 2)))

    err_ours = np.abs(ours - exact).max()
    err_ref = np.abs(ref_form - exact).max()
    assert err_ours < 1e-4
    assert err_ours < err_ref / 10


def test_sf2_stable_form_beats_reference_formula():
    """At tiny tau, the cancellation-free general-sf form must track the fp64
    exact solve far better than the reference's /tau formulation (sf=2)."""
    rng = np.random.default_rng(11)
    sf, n = 2, 8
    k = fspecial_gaussian(3, 0.6).astype(np.float32)
    x0 = rng.random((1, n * sf, n * sf, 1)).astype(np.float32)
    y = rng.random((1, n, n, 1)).astype(np.float32)
    tau = 1e-5

    op = precompute(jnp.asarray(y), jnp.asarray(k)[None], sf)
    ours = np.asarray(prox_solve(jnp.asarray(x0), op, tau))

    # fp64 exact via dense normal equations
    N = (n * sf) ** 2
    Hmat = np.zeros((n * n, N))
    for j in range(N):
        e = np.zeros((1, n * sf, n * sf, 1), np.float32)
        e.flat[j] = 1.0
        col = np.asarray(downsample_strided(
            blur_circular(jnp.asarray(e), jnp.asarray(k)[None]), sf))
        Hmat[:, j] = col.flatten()
    A = Hmat.astype(np.float64)
    exact = np.linalg.solve(A.T @ A + tau * np.eye(N),
                            A.T @ y.flatten().astype(np.float64)
                            + tau * x0.flatten().astype(np.float64)).reshape(ours.shape)

    # fp32 transcription of the reference's general-sf formula
    F0 = np.fft.fft2(x0[..., 0], axes=(1, 2)).astype(np.complex64)[..., None]
    FR = np.asarray(op.FBFy) + tau * F0
    def amean(a):
        b, H, W, c = a.shape
        return a.reshape(b, sf, H // sf, sf, W // sf, c).mean(axis=(1, 3))
    FBR = amean(np.asarray(op.FB) * FR)
    invW = amean(np.asarray(op.F2B))
    invWBR = FBR / (invW + tau)
    FX = (FR - np.asarray(op.FBC) * np.tile(invWBR, (1, sf, sf, 1))) / tau
    ref_form = np.real(np.fft.ifft2(FX[..., 0], axes=(1, 2)))[..., None]

    err_ours = np.abs(ours - exact).max()
    err_ref = np.abs(ref_form - exact).max()
    assert err_ours < 1e-4
    assert err_ours < err_ref / 10


def test_blur_circular_matches_scipy_wrap():
    from scipy import ndimage

    rng = np.random.default_rng(5)
    x = rng.random((1, 16, 16, 3)).astype(np.float32)
    k = fspecial_gaussian(7, 1.5).astype(np.float32)
    ref = ndimage.convolve(x[0], k[:, :, None], mode="wrap")
    ours = np.asarray(blur_circular(jnp.asarray(x), jnp.asarray(k)[None]))[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_psf_to_otf_batched_narrow_kernels():
    """(B, h, 1) is a batch of 1-pixel-wide PSFs, NOT a channeled 2-D kernel:
    the trailing-singleton squeeze applies to 4-D input only."""
    import jax.numpy as jnp

    from diffpir_tpu.ops.fft_prox import psf_to_otf

    # identity PSF batch (B, 1, 1): OTF must be all-ones at every frequency
    k = jnp.ones((3, 1, 1), jnp.float32)
    otf = psf_to_otf(k, (8, 8))
    assert otf.shape == (3, 8, 8)
    np.testing.assert_allclose(np.asarray(otf), np.ones((3, 8, 8)), atol=1e-6)

    # vertical 3x1 box blur batch: matches the per-kernel 2-D path
    k2 = jnp.full((2, 3, 1), 1.0 / 3.0, jnp.float32)
    otf2 = psf_to_otf(k2, (8, 8))
    single = psf_to_otf(jnp.full((3, 1), 1.0 / 3.0), (8, 8))
    assert otf2.shape == (2, 8, 8)
    np.testing.assert_allclose(np.asarray(otf2[0]), np.asarray(single),
                               atol=1e-6)
