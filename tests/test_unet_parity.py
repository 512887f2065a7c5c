"""Flax UNet vs PyTorch guided-diffusion UNet: activation-level parity.

Builds a tiny randomly-initialized torch ``UNetModel``, converts its
``state_dict`` through ``diffpir_tpu.models.convert``, and checks outputs agree
to float32 tolerance on fixed inputs (SURVEY.md §7 step 2 acceptance).
"""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402

torch.manual_seed(0)

from guided_diffusion.unet import UNetModel  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from diffpir_tpu.models.convert import convert_state_dict, flax_to_torch_state_dict  # noqa: E402
from diffpir_tpu.models.unet import UNet, UNetConfig  # noqa: E402


def make_pair(attention_resolutions=(2,), channel_mult=(1, 2), num_res_blocks=1,
              resblock_updown=True, conv_resample=True, num_classes=None,
              use_scale_shift_norm=True, model_channels=32):
    torch_model = UNetModel(
        image_size=16, in_channels=3, model_channels=model_channels, out_channels=6,
        num_res_blocks=num_res_blocks, attention_resolutions=attention_resolutions,
        dropout=0.0, channel_mult=channel_mult, num_classes=num_classes,
        use_checkpoint=False, use_fp16=False, num_heads=4, num_head_channels=16,
        num_heads_upsample=-1, use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown, use_new_attention_order=False,
        conv_resample=conv_resample,
    ).eval()
    # randomize weights (ctor zero-inits some convs; perturb all for a strict test)
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(7)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.05
    torch_model.load_state_dict(sd)

    cfg = UNetConfig(
        image_size=16, model_channels=model_channels, out_channels=6,
        num_res_blocks=num_res_blocks, attention_resolutions=tuple(attention_resolutions),
        channel_mult=tuple(channel_mult), num_heads=4, num_head_channels=16,
        num_classes=num_classes, dropout=0.0,
        use_scale_shift_norm=use_scale_shift_norm,
        resblock_updown=resblock_updown, conv_resample=conv_resample,
    )
    flax_model = UNet(cfg)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})
    return torch_model, flax_model, params, sd


def run_both(torch_model, flax_model, params, num_classes=None):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3, 250], dtype=np.int32)
    y = np.array([1, 0], dtype=np.int64) if num_classes else None

    with torch.no_grad():
        args = (torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t))
        kwargs = {"y": torch.from_numpy(y)} if num_classes else {}
        ref = torch_model(*args, **kwargs).numpy().transpose(0, 2, 3, 1)

    ours = flax_model.apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(y) if num_classes else None)
    return ref, np.asarray(ours)


def test_unet_parity_resblock_updown():
    tm, fm, params, _ = make_pair()
    ref, ours = run_both(tm, fm, params)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_unet_parity_conv_sampling():
    tm, fm, params, _ = make_pair(resblock_updown=False, conv_resample=True)
    ref, ours = run_both(tm, fm, params)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_unet_parity_class_conditional():
    tm, fm, params, _ = make_pair(num_classes=10)
    ref, ours = run_both(tm, fm, params, num_classes=10)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_unet_parity_deep_attention():
    # imagenet-style: several attention resolutions, 2 res blocks
    tm, fm, params, _ = make_pair(attention_resolutions=(1, 2), num_res_blocks=2)
    ref, ours = run_both(tm, fm, params)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def _flat_paths(tree):
    import jax

    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {"/".join(str(k.key) for k in path): v.shape for path, v in leaves}


def test_converter_structure_matches_init():
    import jax

    tm, fm, params, sd = make_pair()
    init = fm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
                   jnp.zeros((1,), jnp.int32))["params"]
    assert _flat_paths(params) == _flat_paths(init)


def test_converter_roundtrip():
    tm, fm, params, sd = make_pair()
    back = flax_to_torch_state_dict(params)
    assert set(back) == set(sd.keys())
    for k in sd:
        np.testing.assert_allclose(back[k], sd[k].numpy(), rtol=1e-6)
