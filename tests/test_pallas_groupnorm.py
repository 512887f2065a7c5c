"""Fused GroupNorm+SiLU kernel vs the XLA reference path (interpret on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffpir_tpu.models.unet import GroupNorm32
from diffpir_tpu.pallas.groupnorm import groupnorm_silu


def _ref(x, scale, bias, film=None, do_silu=True):
    gn = GroupNorm32(fuse_silu=do_silu)
    return gn.apply({"params": {"scale": scale, "bias": bias}}, x, film=film)


@pytest.mark.parametrize("shape", [(2, 8, 8, 64), (1, 16, 16, 128), (2, 7, 9, 32)])
def test_fused_matches_reference(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    c = shape[-1]
    scale = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(c).astype(np.float32))
    ref = _ref(x, scale, bias)
    out = groupnorm_silu(x, scale, bias, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_film_matches_reference():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    fs = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    fb = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
    ref = _ref(x, scale, bias, film=(fs, fb))
    out = groupnorm_silu(x, scale, bias, fs, fb, num_groups=32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_no_silu():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 32)).astype(np.float32))
    scale = jnp.ones(32)
    bias = jnp.zeros(32)
    ref = _ref(x, scale, bias, do_silu=False)
    out = groupnorm_silu(x, scale, bias, do_silu=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unet_pallas_path_matches_xla():
    """Full tiny UNet: use_pallas=True output == use_pallas=False output."""
    from diffpir_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(image_size=16, model_channels=32, out_channels=6,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                     dropout=0.0)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
    t = jnp.asarray([5, 100])
    m0 = UNet(cfg, use_pallas=False)
    m1 = UNet(cfg, use_pallas=True)
    params = m0.init(jax.random.PRNGKey(0), x, t)["params"]
    out0 = m0.apply({"params": params}, x, t)
    out1 = m1.apply({"params": params}, x, t)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               atol=5e-5, rtol=1e-4)


def test_fp32_groupnorm_high_mean_low_variance():
    """fp32 path uses the exact centered variance: groups with |mean| >> std
    must normalize correctly (the one-pass moments form E[x^2]-mean^2 loses
    the variance entirely to fp32 cancellation in this regime)."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal((2, 8, 8, 64)).astype(np.float32)
    x = base * 0.03 + 100.0
    out = _ref(jnp.asarray(x), jnp.ones(64), jnp.zeros(64), do_silu=False)

    x64 = x.astype(np.float64).reshape(2, 8, 8, 32, 2)
    mu = x64.mean(axis=(1, 2, 4), keepdims=True)
    var = ((x64 - mu) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    ref = ((x64 - mu) / np.sqrt(var + 1e-5)).reshape(2, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-3)
