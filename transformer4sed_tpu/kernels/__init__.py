from transformer4sed_tpu.kernels.flash_attention import flash_attention

__all__ = ["flash_attention"]
