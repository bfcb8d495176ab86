from distillclip_tpu.losses import functional
from distillclip_tpu.losses.calculator import IMAGE_TEXT_LOSS, LOSS_NAMES, LossCalculator
from distillclip_tpu.losses.vit_kd import ViTKDLoss

__all__ = ["functional", "LossCalculator", "ViTKDLoss", "LOSS_NAMES", "IMAGE_TEXT_LOSS"]
