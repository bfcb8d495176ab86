from distillclip_tpu.ops.flash_attention import flash_attention, reference_attention

__all__ = ["flash_attention", "reference_attention"]
