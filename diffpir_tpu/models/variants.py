"""UNet variants: super-resolution conditioning and the encoder/classifier half.

Capability parity with reference ``guided_diffusion/unet.py``:
  * ``SuperResUNet``  == ``SuperResModel`` (``unet.py:666-680``): concatenates
    a bilinearly-upsampled low-res conditioning image on the channel axis
    (in_channels doubles).
  * ``EncoderUNet``   == ``EncoderUNetModel`` (``unet.py:683-894``): the
    downsampling half + middle block with a pooling head — the noisy
    classifier used for classifier guidance. Pool modes: adaptive (global
    mean + zero-init 1x1 conv), spatial (mean-pooled multiscale features
    through an MLP), attention (attention pooling with a class token).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffpir_tpu.models.unet import (
    AttentionBlock, GroupNorm32, ResBlock, UNet, UNetConfig, _avgpool2x,
    _conv, _dense, _upsample2x, timestep_embedding,
)

__all__ = ["SuperResUNet", "EncoderUNet", "AttentionPool2d"]


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference ``unet.py:22-51``).

    Prepends a mean token, adds a learned positional embedding, runs one QKV
    attention pass (new head order), and returns the pooled (first) token
    projected to `output_dim`.
    """

    num_head_channels: int
    output_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        t = h * w
        xs = x.reshape(b, t, c)
        xs = jnp.concatenate([xs.mean(axis=1, keepdims=True), xs], axis=1)
        pos = self.param("positional_embedding",
                         lambda k, s, d: jax.random.normal(k, s, d) / c**0.5,
                         (t + 1, c), jnp.float32)
        xs = xs + pos[None].astype(xs.dtype)
        qkv = _dense(3 * c, name="qkv_proj", dtype=self.dtype)(xs)
        heads = c // self.num_head_channels
        # "new order" QKV: channel layout [q|k|v][head][ch] (unet.py:361-389)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(u):
            return u.reshape(b, t + 1, heads, self.num_head_channels)

        q, k, v = map(split_heads, (q, k, v))
        scale = 1.0 / jnp.sqrt(jnp.sqrt(float(self.num_head_channels)))
        logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        wgt = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshc->bthc", wgt, v).reshape(b, t + 1, c)
        out = _dense(self.output_dim, name="c_proj", dtype=self.dtype)(out)
        return out[:, 0]


def _bilinear_resize(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    return jax.image.resize(x, (x.shape[0], hw[0], hw[1], x.shape[-1]),
                            method="bilinear")


class SuperResUNet(nn.Module):
    """UNet conditioned on an upsampled low-resolution image.

    cfg.in_channels must equal 2 * image channels (reference doubles it in the
    ctor, ``unet.py:673-674``).
    """

    cfg: UNetConfig
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, low_res: jax.Array,
                 y: Optional[jax.Array] = None, *,
                 deterministic: bool = True) -> jax.Array:
        upsampled = _bilinear_resize(low_res, x.shape[1:3])
        x = jnp.concatenate([x, upsampled], axis=-1)
        return UNet(self.cfg, dtype=self.dtype, use_pallas=self.use_pallas,
                    name="unet")(x, t, y, deterministic=deterministic)


class EncoderUNet(nn.Module):
    """Downsampling half of the UNet with a pooled classification head."""

    cfg: UNetConfig
    pool: str = "adaptive"          # adaptive | spatial | spatial_v2
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, *,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        time_dim = cfg.model_channels * 4
        emb = timestep_embedding(t, cfg.model_channels)
        emb = _dense(time_dim, name="time_embed_0", dtype=self.dtype)(emb)
        emb = _dense(time_dim, name="time_embed_2", dtype=self.dtype)(nn.silu(emb))

        h = x.astype(self.dtype)
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        h = _conv(ch, name="input_blocks_0_0", dtype=self.dtype)(h)
        results = []

        def pool_feat(v):
            return v.mean(axis=(1, 2))

        if self.pool.startswith("spatial"):
            results.append(pool_feat(h))
        ds, block_idx = 1, 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = int(mult * cfg.model_channels)
                h = ResBlock(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                             dropout=cfg.dropout, dtype=self.dtype,
                             name=f"input_blocks_{block_idx}_0")(
                                 h, emb, deterministic=deterministic)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(cfg.heads_for(ch), dtype=self.dtype,
                                       use_pallas=self.use_pallas,
                                       name=f"input_blocks_{block_idx}_1")(h)
                if self.pool.startswith("spatial"):
                    results.append(pool_feat(h))
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                # honor the downsample family like UNet (unet.py:352-360) so
                # converted checkpoints of every topology line up
                if cfg.resblock_updown:
                    h = ResBlock(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                                 dropout=cfg.dropout, dtype=self.dtype, down=True,
                                 name=f"input_blocks_{block_idx}_0")(
                                     h, emb, deterministic=deterministic)
                elif cfg.conv_resample:
                    h = _conv(ch, 3, 2, name=f"input_blocks_{block_idx}_0",
                              dtype=self.dtype)(h)
                else:
                    h = _avgpool2x(h)
                if self.pool.startswith("spatial"):
                    # the reference pools after EVERY input block, including
                    # each downsample block (unet.py:883-886)
                    results.append(pool_feat(h))
                ds *= 2
                block_idx += 1

        h = ResBlock(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     name="middle_block_0")(h, emb, deterministic=deterministic)
        h = AttentionBlock(cfg.heads_for(ch), dtype=self.dtype,
                           use_pallas=self.use_pallas, name="middle_block_1")(h)
        h = ResBlock(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     name="middle_block_2")(h, emb, deterministic=deterministic)

        if self.pool == "attention":
            h = GroupNorm32(name="out_norm", fuse_silu=True)(h.astype(jnp.float32))
            return AttentionPool2d(self.cfg.num_head_channels,
                                   self.cfg.out_channels, dtype=self.dtype,
                                   name="out_pool")(h)
        if self.pool == "adaptive":
            h = GroupNorm32(name="out_norm")(h.astype(jnp.float32))
            h = nn.silu(h)
            h = h.mean(axis=(1, 2), keepdims=True)
            h = nn.Dense(self.cfg.out_channels,
                         kernel_init=nn.initializers.zeros,
                         param_dtype=jnp.float32, name="out_conv")(h)
            return h[:, 0, 0, :]
        # spatial pooling heads
        results.append(pool_feat(h.astype(jnp.float32)))
        feats = jnp.concatenate(results, axis=-1)
        if self.pool == "spatial_v2":
            feats = nn.Dense(2048, param_dtype=jnp.float32, name="out_0")(feats)
            feats = GroupNorm32(name="out_norm")(feats[:, None, None, :])[:, 0, 0, :]
            feats = nn.silu(feats)
            return nn.Dense(self.cfg.out_channels, param_dtype=jnp.float32,
                            name="out_3")(feats)
        feats = nn.relu(nn.Dense(2048, param_dtype=jnp.float32,
                                 name="out_0")(feats))
        return nn.Dense(self.cfg.out_channels, param_dtype=jnp.float32,
                        name="out_2")(feats)
