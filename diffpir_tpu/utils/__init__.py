from diffpir_tpu.utils import image

__all__ = ["image"]
