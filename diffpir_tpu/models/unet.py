"""TPU-native diffusion UNet (Flax/linen, NHWC, bf16-ready).

Topology parity with the OpenAI guided-diffusion ``UNetModel``
(reference ``guided_diffusion/unet.py:396-663``) so the published checkpoints
(``diffusion_ffhq_10m``, ``256x256_diffusion_uncond``) load through
``diffpir_tpu.models.convert``.  Numerics that matter for parity:

* GroupNorm always computes in float32 and casts back (``nn.py:17-19``),
  eps=1e-5 (torch default).
* FiLM scale-shift conditioning: ``h = norm(h) * (1 + scale) + shift``
  with scale the FIRST half of the projection (``unet.py:248-252``).
* Legacy QKV head ordering: channel layout [head][q|k|v][ch]
  (``unet.py:328-354``, used because use_new_attention_order=False for both
  published checkpoints); 1/sqrt(sqrt(ch)) pre-scaling on q AND k; softmax in
  float32.
* Zero-initialized output convs (``nn.py:68-74``).
* Sinusoidal timestep embedding with cos-first concat (``nn.py:103-121``).

TPU-first deviations from the reference implementation (not semantics):
NHWC layout for MXU-friendly convs, a single fused QKV dense per attention
block, optional fused Pallas attention/groupnorm kernels, and compute dtype
(bfloat16 by default on TPU) with float32 parameter storage.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["UNetConfig", "UNet", "timestep_embedding", "MODEL_ZOO_CONFIGS"]


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: float = 10000.0) -> jax.Array:
    """Sinusoidal embeddings, [cos|sin] concat order (reference ``nn.py:103-121``)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 regardless of activation dtype.

    Parity with reference ``nn.py:17-19`` (fp32 cast) and ``nn.py:93-100``
    (32 groups, torch eps=1e-5).  Optional fusions (identical math):
      * ``fuse_silu``: apply SiLU after the affine norm
      * ``film``: per-sample (B, C) FiLM scale/shift between norm and SiLU
      * ``use_pallas``: route through the single-pass fused TPU kernel
        (``diffpir_tpu.pallas.groupnorm``) — avoids materializing the fp32
        upcast copy of the activation in HBM (the UNet is bandwidth-bound).
    """

    num_groups: int = 32
    fuse_silu: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array,
                 film: Optional[tuple[jax.Array, jax.Array]] = None) -> jax.Array:
        dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        if self.use_pallas and x.ndim == 4:
            from diffpir_tpu.pallas.groupnorm import groupnorm_silu

            fs = None if film is None else film[0].astype(jnp.float32)
            fb = None if film is None else film[1].astype(jnp.float32)
            return groupnorm_silu(x, scale, bias, fs, fb,
                                  num_groups=self.num_groups,
                                  do_silu=self.fuse_silu)

        # Stats as per-channel fp32 spatial reductions combined per group.
        # The naive form (astype(f32) -> 5-D group reshape -> mean/var) makes
        # XLA materialize an fp32 copy of the activation in a reduce-friendly
        # layout and transpose it back for the next conv — measured 25% of
        # flagship forward time in pure `copy` ops on TPU v5e.  Reducing the
        # bf16 tensor directly (convert fused INTO the reduction) and applying
        # one folded multiply-add keeps everything in the conv layout with no
        # extra materialization.
        g = self.num_groups
        b = x.shape[0]
        spatial = tuple(range(1, x.ndim - 1))
        n_per_group = (np.prod(x.shape[1:-1]) * (c // g)).astype(np.float32)
        s1 = jnp.sum(x, axis=spatial, dtype=jnp.float32)            # (B, C)
        gs1 = s1.reshape(b, g, c // g).sum(-1)                       # (B, G)
        mean = gs1 / n_per_group
        if x.dtype == jnp.float32:
            # fp32 parity path: exact centered second moment.  The one-pass
            # moments form E[x^2] - mean^2 cancels catastrophically when
            # |mean| >> std (fp32 quantization of mean^2 can exceed the true
            # variance), and fp32 mode exists precisely for checkpoint/parity
            # validation — pay the second pass for exactness.
            mean_c_full = jnp.repeat(mean, c // g, axis=-1).reshape(
                (b,) + (1,) * (x.ndim - 2) + (c,))
            d2 = jnp.sum(jnp.square(x - mean_c_full), axis=spatial)
            var = d2.reshape(b, g, c // g).sum(-1) / n_per_group
        else:
            # bf16 fast path: one-pass moments form keeps the activation in
            # the conv layout with a single read.  Cancellation error here is
            # bounded by fp32 eps * mean^2, orders below the bf16 input
            # quantization for any realistic activation statistics.
            s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=spatial)
            gs2 = s2.reshape(b, g, c // g).sum(-1)
            # moments form can go epsilon-negative for near-constant groups
            var = jnp.maximum(gs2 / n_per_group - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)
        # fold (x - mean) * inv * scale + bias into one fma per element
        mean_c = jnp.repeat(mean, c // g, axis=-1)                   # (B, C)
        inv_c = jnp.repeat(inv, c // g, axis=-1)
        w = inv_c * scale[None]
        off = bias[None] - mean_c * w
        if film is not None:
            fs, fb = film
            w = w * (1.0 + fs.astype(jnp.float32))
            off = off * (1.0 + fs.astype(jnp.float32)) + fb.astype(jnp.float32)
        bshape = (b,) + (1,) * (x.ndim - 2) + (c,)
        x = x.astype(jnp.float32) * w.reshape(bshape) + off.reshape(bshape)
        if self.fuse_silu:
            x = nn.silu(x)
        return x.astype(dtype)


def _precision(dtype) -> Optional[jax.lax.Precision]:
    """True-fp32 MXU passes when compute dtype is float32.

    JAX's default matmul precision can demote fp32 operands to bfloat16 on both
    CPU and TPU; for the fp32 parity path (checkpoint validation, prox-adjacent
    math) we require exact float32.  bfloat16 compute keeps the fast default —
    the MXU already accumulates in fp32.
    """
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


def _conv(features: int, kernel: int = 3, stride: int = 1, *, name: str,
          zero_init: bool = False, dtype: Any = jnp.float32) -> nn.Conv:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        kernel_init=init, bias_init=nn.initializers.zeros,
        dtype=dtype, param_dtype=jnp.float32, precision=_precision(dtype), name=name,
    )


def _dense(features: int, *, name: str, zero_init: bool = False,
           dtype: Any = jnp.float32) -> nn.Dense:
    init = nn.initializers.zeros if zero_init else nn.initializers.lecun_normal()
    return nn.Dense(features, kernel_init=init, dtype=dtype,
                    param_dtype=jnp.float32, precision=_precision(dtype), name=name)


def _upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsampling (reference ``unet.py:100-110``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def _avgpool2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class ResBlock(nn.Module):
    """Residual block with FiLM conditioning and optional up/down sampling.

    Parity with reference ``unet.py:143-256``.  Submodule names are stable
    anchors for the checkpoint converter:
      norm1/conv1 = in_layers, emb_proj = emb_layers.1, norm2/conv2 = out_layers,
      skip = skip_connection.
    """

    out_channels: int
    use_scale_shift_norm: bool = True
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, *, deterministic: bool = True) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="norm1", fuse_silu=True, use_pallas=self.use_pallas)(x)
        if self.up:
            h, x = _upsample2x(h), _upsample2x(x)
        elif self.down:
            h, x = _avgpool2x(h), _avgpool2x(x)
        h = _conv(self.out_channels, name="conv1", dtype=self.dtype)(h)

        emb_out = _dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            name="emb_proj", dtype=self.dtype,
        )(nn.silu(emb)).astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="norm2", fuse_silu=True,
                            use_pallas=self.use_pallas)(h, film=(scale, shift))
        else:
            h = h + emb_out[:, None, None, :]
            h = GroupNorm32(name="norm2", fuse_silu=True,
                            use_pallas=self.use_pallas)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv(self.out_channels, name="conv2", zero_init=True, dtype=self.dtype)(h)

        if in_ch != self.out_channels:
            skip_kernel = 3 if self.use_conv_skip else 1
            x = _conv(self.out_channels, skip_kernel, name="skip", dtype=self.dtype)(x)
        return x + h


def _legacy_qkv_attention(qkv: jax.Array, num_heads: int) -> jax.Array:
    """Legacy head-major QKV attention (reference ``unet.py:328-354``).

    qkv: (B, T, 3*C) with channel layout [head][q|k|v][head_dim].
    Returns (B, T, C).
    """
    b, t, w = qkv.shape
    ch = w // (3 * num_heads)
    qkv = qkv.reshape(b, t, num_heads, 3, ch)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]  # (B, T, H, ch)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    prec = _precision(qkv.dtype)
    logits = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale, precision=prec)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhts,bshc->bthc", weights, v, precision=prec)
    return out.reshape(b, t, num_heads * ch)


class AttentionBlock(nn.Module):
    """Global self-attention over spatial positions (reference ``unet.py:259-305``).

    use_pallas routes through the fused flash-style kernel in
    ``diffpir_tpu.pallas.attention`` (identical math, single VMEM-resident pass).
    """

    num_heads: int
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = GroupNorm32(name="norm")(x).reshape(b, hh * ww, c)
        qkv = _dense(3 * c, name="qkv", dtype=self.dtype)(h)
        if self.use_pallas:
            from diffpir_tpu.pallas.attention import legacy_qkv_attention as fused
            a = fused(qkv, self.num_heads)
        else:
            a = _legacy_qkv_attention(qkv, self.num_heads)
        a = _dense(c, name="proj", zero_init=True, dtype=self.dtype)(a)
        return x + a.reshape(b, hh, ww, c)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Static architecture description (reference ``script_util.py:130-185`` defaults)."""

    image_size: int = 256
    in_channels: int = 3
    model_channels: int = 128
    out_channels: int = 6              # learn_sigma=True -> 6 (eps + var)
    num_res_blocks: int = 1
    attention_resolutions: Tuple[int, ...] = (16,)   # downsample rates with attention
    channel_mult: Tuple[int, ...] = (1, 1, 2, 2, 4, 4)
    num_heads: int = 4
    num_head_channels: int = 64
    num_classes: Optional[int] = None
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    conv_resample: bool = True
    # Gradient rematerialization per Res/Attention block (reference
    # ``use_checkpoint``, ``guided_diffusion/unet.py:154-162`` /
    # ``nn.py:124-170`` custom checkpoint Function).  TPU form: flax
    # ``nn.remat`` == ``jax.checkpoint`` around each block — activations
    # inside a block are recomputed during backward instead of stored,
    # trading ~1 extra forward for O(depth) less HBM.  Needed to train the
    # 553M imagenet flagship on a single 16 GB v5e chip.
    use_remat: bool = False

    def heads_for(self, ch: int) -> int:
        if self.num_head_channels == -1:
            return self.num_heads
        assert ch % self.num_head_channels == 0
        return ch // self.num_head_channels

    @staticmethod
    def from_name(model_name: str) -> "UNetConfig":
        return MODEL_ZOO_CONFIGS[model_name]


# Hard-coded per-checkpoint configs (reference ``main_ddpir.py:219-230`` +
# defaults ``utils/utils_model.py:353-387``).
MODEL_ZOO_CONFIGS = {
    "diffusion_ffhq_10m": UNetConfig(
        model_channels=128, num_res_blocks=1, attention_resolutions=(16,), dropout=0.1
    ),
    "256x256_diffusion_uncond": UNetConfig(
        model_channels=256, num_res_blocks=2, attention_resolutions=(8, 16, 32), dropout=0.0
    ),
}


class UNet(nn.Module):
    """guided-diffusion UNet, NHWC.

    __call__(x: (B,H,W,C) in [-1,1], t: (B,) int/float base timesteps,
             y: optional (B,) int class labels) -> (B,H,W,out_channels).

    Block indexing mirrors the torch ModuleList layout
    (``unet.py:481-616``) so the converter can map keys positionally:
    flax name ``input_blocks_{i}_{j}`` == torch ``input_blocks.{i}.{j}``.
    """

    cfg: UNetConfig
    dtype: Any = jnp.float32
    use_pallas: bool = False          # fused attention kernel
    use_pallas_gn: bool = False       # fused GroupNorm kernel — measured SLOWER
                                      # than XLA's fusion on v5e (16x); kept for
                                      # experimentation only

    @nn.compact
    def __call__(self, x: jax.Array, t: jax.Array, y: Optional[jax.Array] = None,
                 *, deterministic: bool = True) -> jax.Array:
        cfg = self.cfg
        assert (y is not None) == (cfg.num_classes is not None)
        time_dim = cfg.model_channels * 4
        # per-block rematerialization (see UNetConfig.use_remat); wrapping the
        # classes keeps flax param names identical, so checkpoints and the
        # .pt converter are remat-agnostic
        Res = nn.remat(ResBlock) if cfg.use_remat else ResBlock
        Attn = nn.remat(AttentionBlock) if cfg.use_remat else AttentionBlock

        emb = timestep_embedding(t, cfg.model_channels)
        emb = _dense(time_dim, name="time_embed_0", dtype=self.dtype)(emb)
        emb = _dense(time_dim, name="time_embed_2", dtype=self.dtype)(nn.silu(emb))
        if cfg.num_classes is not None:
            emb = emb + nn.Embed(cfg.num_classes, time_dim, name="label_emb",
                                 param_dtype=jnp.float32, dtype=self.dtype)(y)

        def res(i, j, ch, **kw):
            return Res(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                            dropout=cfg.dropout, dtype=self.dtype,
                            use_pallas=self.use_pallas_gn,
                            name=f"input_blocks_{i}_{j}" if isinstance(i, int) else f"{i}_{j}",
                            **kw)

        h = x.astype(self.dtype)
        hs = []
        ch = int(cfg.channel_mult[0] * cfg.model_channels)
        h = _conv(ch, name="input_blocks_0_0", dtype=self.dtype)(h)
        hs.append(h)

        ds = 1
        block_idx = 1
        for level, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                ch = int(mult * cfg.model_channels)
                h = res(block_idx, 0, ch)(h, emb, deterministic=deterministic)
                if ds in cfg.attention_resolutions:
                    h = Attn(cfg.heads_for(ch), dtype=self.dtype,
                                       use_pallas=self.use_pallas,
                                       name=f"input_blocks_{block_idx}_1")(h)
                hs.append(h)
                block_idx += 1
            if level != len(cfg.channel_mult) - 1:
                if cfg.resblock_updown:
                    h = res(block_idx, 0, ch, down=True)(h, emb, deterministic=deterministic)
                else:
                    h = _conv(ch, 3, 2, name=f"input_blocks_{block_idx}_0",
                              dtype=self.dtype)(h) if cfg.conv_resample else _avgpool2x(h)
                hs.append(h)
                ds *= 2
                block_idx += 1

        h = Res(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     use_pallas=self.use_pallas_gn,
                     name="middle_block_0")(h, emb, deterministic=deterministic)
        h = Attn(cfg.heads_for(ch), dtype=self.dtype,
                           use_pallas=self.use_pallas, name="middle_block_1")(h)
        h = Res(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                     dropout=cfg.dropout, dtype=self.dtype,
                     use_pallas=self.use_pallas_gn,
                     name="middle_block_2")(h, emb, deterministic=deterministic)

        block_idx = 0
        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for i in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                ch = int(cfg.model_channels * mult)
                h = Res(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                             dropout=cfg.dropout, dtype=self.dtype,
                             use_pallas=self.use_pallas_gn,
                             name=f"output_blocks_{block_idx}_0")(h, emb,
                                                                  deterministic=deterministic)
                j = 1
                if ds in cfg.attention_resolutions:
                    h = Attn(cfg.heads_for(ch), dtype=self.dtype,
                                       use_pallas=self.use_pallas,
                                       name=f"output_blocks_{block_idx}_1")(h)
                    j = 2
                if level and i == cfg.num_res_blocks:
                    if cfg.resblock_updown:
                        h = Res(ch, use_scale_shift_norm=cfg.use_scale_shift_norm,
                                     dropout=cfg.dropout, dtype=self.dtype, up=True,
                                     use_pallas=self.use_pallas_gn,
                                     name=f"output_blocks_{block_idx}_{j}")(
                                         h, emb, deterministic=deterministic)
                    else:
                        h = _upsample2x(h)
                        if cfg.conv_resample:
                            h = _conv(ch, name=f"output_blocks_{block_idx}_{j}",
                                      dtype=self.dtype)(h)
                    ds //= 2
                block_idx += 1

        # Output head runs in the compute dtype (GroupNorm stats are fp32
        # internally regardless).  An fp32 head on a bf16 network is false
        # precision at 6x MXU cost + 2x HBM traffic — profiled as the single
        # hottest op of the flagship forward (~17%).  fp32 mode (parity /
        # prox-adjacent paths) is unchanged: dtype == float32 end to end.
        h = GroupNorm32(name="out_norm", fuse_silu=True,
                        use_pallas=self.use_pallas_gn)(h)
        return _conv(cfg.out_channels, name="out_conv", zero_init=True,
                     dtype=self.dtype)(h)
