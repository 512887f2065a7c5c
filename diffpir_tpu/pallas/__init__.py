from diffpir_tpu.pallas.attention import legacy_qkv_attention

__all__ = ["legacy_qkv_attention"]
