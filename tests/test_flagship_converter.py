"""Converter validation at FLAGSHIP topology (the published checkpoints).

Round-1 parity tests covered only tiny 2-level topologies; a positional-naming
bug at depth 6 (e.g. output-block attention/upsample index collisions) would
surface only when the real checkpoints load.  These tests build the real torch
``UNetModel`` for both published configs (reference ``utils/utils_model.py:353-387``,
``script_util.py:148-158``; ffhq: 128ch/1res/attn ds16, imagenet:
256ch/2res/attn ds8,16,32; shared: 256px, channel_mult (1,1,2,2,4,4),
num_head_channels=64, resblock_updown, scale-shift norm) with random weights,
convert via ``models.convert``, and assert

  (a) converted param tree == ``flax.init`` tree (every path and shape), and
  (b) one full 256-px fp32 forward agrees to <= 1e-4.
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402

from guided_diffusion.unet import UNetModel  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diffpir_tpu.models.convert import convert_state_dict  # noqa: E402
from diffpir_tpu.models.unet import MODEL_ZOO_CONFIGS, UNet  # noqa: E402

FLAGSHIPS = sorted(MODEL_ZOO_CONFIGS)  # diffusion_ffhq_10m, 256x256_diffusion_uncond


def build_flagship_pair(name):
    cfg = MODEL_ZOO_CONFIGS[name]
    torch_model = UNetModel(
        image_size=cfg.image_size, in_channels=3,
        model_channels=cfg.model_channels, out_channels=cfg.out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=cfg.attention_resolutions, dropout=cfg.dropout,
        channel_mult=cfg.channel_mult, num_classes=cfg.num_classes,
        use_checkpoint=False, use_fp16=False, num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels, num_heads_upsample=-1,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown, conv_resample=cfg.conv_resample,
        use_new_attention_order=False,
    ).eval()
    # perturb ALL weights (ctor zero-inits out convs; a strict test must not
    # let zero tensors mask transposition/indexing bugs)
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(11)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.04
    torch_model.load_state_dict(sd)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    return torch_model, UNet(cfg), params


def _flat_paths(tree):
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(k.key) for k in path): tuple(v.shape)
            for path, v in leaves}


@pytest.mark.parametrize("name", FLAGSHIPS)
def test_flagship_tree_matches_init(name):
    torch_model, flax_model, params = build_flagship_pair(name)
    # eval_shape: full init trace without any FLOPs
    tree = jax.eval_shape(
        flax_model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 256, 256, 3), jnp.float32), jnp.zeros((1,), jnp.int32))
    assert _flat_paths(params) == _flat_paths(tree["params"])
    # sanity: flagship scale reached (95M / 550M params)
    n_params = sum(int(np.prod(s)) for s in _flat_paths(params).values())
    expected = {"diffusion_ffhq_10m": 93.6e6, "256x256_diffusion_uncond": 552.8e6}
    assert abs(n_params - expected[name]) / expected[name] < 0.02, n_params


@pytest.mark.parametrize("name", FLAGSHIPS)
def test_flagship_forward_parity_256px(name):
    torch_model, flax_model, params = build_flagship_pair(name)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 256, 256, 3)).astype(np.float32)
    t = np.array([500], dtype=np.int32)

    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(flax_model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=1e-4, rtol=1e-4)


def test_conv_resample_topology_roundtrip_and_parity():
    """resblock_updown=False topologies: standalone Downsample/Upsample convs
    live under torch `.op`/`.conv` nesting (unet.py:98,131) — the converter
    must map them both ways (the inverse previously emitted bare `.weight`
    keys that strict load_state_dict rejects)."""
    from diffpir_tpu.models.convert import flax_to_torch_state_dict
    from diffpir_tpu.models.unet import UNetConfig

    torch_model = UNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=6,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), num_classes=None, use_checkpoint=False,
        use_fp16=False, num_heads=4, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=True,
        resblock_updown=False, conv_resample=True,
        use_new_attention_order=False,
    ).eval()
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(7)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.04
    torch_model.load_state_dict(sd)
    assert any(".op.weight" in k for k in sd), "fixture must contain Downsample"
    assert any(".conv.weight" in k for k in sd), "fixture must contain Upsample"

    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    cfg = UNetConfig(image_size=16, model_channels=32, out_channels=6,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                     dropout=0.0, use_scale_shift_norm=True,
                     resblock_updown=False, conv_resample=True)
    flax_model = UNet(cfg)

    # forward parity
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([5, 400], np.int32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t)).numpy().transpose(0, 2, 3, 1)
    ours = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x),
                                       jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)

    # exact round trip: torch -> flax -> torch loads strict and bit-matches
    back = flax_to_torch_state_dict(params)
    assert set(back) == set(sd)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in back.items()},
        strict=True)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy(), err_msg=k)
