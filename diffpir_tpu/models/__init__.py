from diffpir_tpu.models.unet import UNet, UNetConfig, MODEL_ZOO_CONFIGS
from diffpir_tpu.models.convert import convert_state_dict, load_torch_checkpoint

__all__ = ["UNet", "UNetConfig", "MODEL_ZOO_CONFIGS", "convert_state_dict",
           "load_torch_checkpoint"]
