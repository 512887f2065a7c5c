"""EncoderUNet (classifier) parity vs the torch EncoderUNetModel."""

import numpy as np
import pytest

from tests.conftest import add_reference_to_path, reference_available

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)

add_reference_to_path()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from guided_diffusion.unet import EncoderUNetModel  # noqa: E402

from diffpir_tpu.models.convert import convert_state_dict  # noqa: E402
from diffpir_tpu.models.unet import UNetConfig  # noqa: E402
from diffpir_tpu.models.variants import EncoderUNet  # noqa: E402


def test_encoder_attention_pool_parity():
    torch_model = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), use_checkpoint=False, use_fp16=False,
        num_heads=4, num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=False, pool="attention",
    ).eval()
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(3)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.05
    torch_model.load_state_dict(sd)

    cfg = UNetConfig(image_size=16, model_channels=32, out_channels=10,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                     dropout=0.0, use_scale_shift_norm=True, resblock_updown=True)
    flax_model = EncoderUNet(cfg, pool="attention")
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([3, 200], dtype=np.int32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t)).numpy()
    ours = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x),
                                       jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize("pool", ["adaptive", "spatial", "spatial_v2"])
def test_encoder_other_pool_heads_parity(pool):
    """adaptive / spatial / spatial_v2 classifier heads convert and match
    (reference unet.py:822-853; previously only attention pooling was
    converter-supported)."""
    torch_model = EncoderUNetModel(
        image_size=16, in_channels=3, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), dropout=0.0,
        channel_mult=(1, 2), use_checkpoint=False, use_fp16=False,
        num_heads=4, num_head_channels=16, num_heads_upsample=-1,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=False, pool=pool,
    ).eval()
    sd = torch_model.state_dict()
    gen = torch.Generator().manual_seed(5)
    for k in sd:
        sd[k] = torch.randn(sd[k].shape, generator=gen) * 0.05
    torch_model.load_state_dict(sd)

    cfg = UNetConfig(image_size=16, model_channels=32, out_channels=10,
                     num_res_blocks=1, attention_resolutions=(2,),
                     channel_mult=(1, 2), num_heads=4, num_head_channels=16,
                     dropout=0.0, use_scale_shift_norm=True, resblock_updown=True)
    flax_model = EncoderUNet(cfg, pool=pool)
    params = convert_state_dict({k: v.numpy() for k, v in sd.items()})

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    t = np.array([7, 321], dtype=np.int32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                          torch.from_numpy(t)).numpy()
    ours = np.asarray(flax_model.apply({"params": params}, jnp.asarray(x),
                                       jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref, atol=5e-5, rtol=1e-4)
