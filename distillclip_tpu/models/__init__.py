from distillclip_tpu.models.outputs import (
    AttentionOutput,
    CLIPOutput,
    ControlFlags,
    TextOutput,
    TransformerOutput,
    VisionOutput,
)
from distillclip_tpu.models.clip import CLIPModel, l2_normalize
from distillclip_tpu.models.encoders import ImageEncoder, TextEncoder
from distillclip_tpu.models.irpe import RpeConfig, rpe_config_from_dict
from distillclip_tpu.models.repeat_vit import RepeatTextTransformer, RepeatVisionTransformer
from distillclip_tpu.models.text import TextTransformer
from distillclip_tpu.models.vit import VisionTransformer

__all__ = [
    "AttentionOutput",
    "CLIPOutput",
    "CLIPModel",
    "ControlFlags",
    "ImageEncoder",
    "RepeatTextTransformer",
    "RepeatVisionTransformer",
    "RpeConfig",
    "TextEncoder",
    "TextOutput",
    "TextTransformer",
    "TransformerOutput",
    "VisionOutput",
    "VisionTransformer",
    "l2_normalize",
    "rpe_config_from_dict",
]
