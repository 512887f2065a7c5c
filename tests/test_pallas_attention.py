"""Pallas fused attention vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from diffpir_tpu.models.unet import _legacy_qkv_attention
from diffpir_tpu.pallas.attention import legacy_qkv_attention


@pytest.mark.parametrize("t,heads,ch", [(64, 4, 16), (256, 2, 64), (1024, 4, 64)])
def test_fused_matches_xla(t, heads, ch):
    rng = np.random.default_rng(0)
    qkv = rng.standard_normal((2, t, 3 * heads * ch)).astype(np.float32)
    ref = _legacy_qkv_attention(jnp.asarray(qkv), heads)
    out = legacy_qkv_attention(jnp.asarray(qkv), heads)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_fused_bf16():
    rng = np.random.default_rng(1)
    qkv = rng.standard_normal((1, 64, 3 * 2 * 16)).astype(np.float32)
    ref = np.asarray(_legacy_qkv_attention(jnp.asarray(qkv, jnp.bfloat16), 2),
                     dtype=np.float32)
    out = np.asarray(legacy_qkv_attention(jnp.asarray(qkv, jnp.bfloat16), 2),
                     dtype=np.float32)
    np.testing.assert_allclose(out, ref, atol=3e-2, rtol=3e-2)
