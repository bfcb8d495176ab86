"""DistillCLIP-TPU: a TPU-native JAX framework for CLIP knowledge distillation.

A ground-up rebuild of the capabilities of the DistillCLIP / L-CLIPScore
reference system (three-stage CLIP distillation producing a lightweight
dual-encoder captioning metric), designed TPU-first:

- flax.linen modules with fp32 parameters and bf16 compute (fp32 LayerNorm),
- a single jitted train step sharded over a ``jax.sharding.Mesh``,
- Pallas flash-attention for the hot attention path,
- optax optimizers with mask-based freeze/unfreeze (no requires_grad mutation),
- Orbax checkpointing with cross-stage prefix-mapped restore,
- a YAML config system with class-path dependency injection.

Reference behavior surface: ForJadeForest/DistillCLIP (see SURVEY.md).
"""

__version__ = "0.1.0"

from distillclip_tpu.models.outputs import (
    ControlFlags,
    AttentionOutput,
    TransformerOutput,
    VisionOutput,
    TextOutput,
    CLIPOutput,
)

__all__ = [
    "ControlFlags",
    "AttentionOutput",
    "TransformerOutput",
    "VisionOutput",
    "TextOutput",
    "CLIPOutput",
    "__version__",
]


def __getattr__(name):
    """Lazy top-level API (keeps bare import light):

    DistillTask, DualDistillTask, Trainer, LCLIPScorer, LossCalculator,
    CLIPModel, teacher_load, MainDataModule.
    """
    lazy = {
        "DistillTask": "distillclip_tpu.training.distill",
        "DualDistillTask": "distillclip_tpu.training.dual",
        "Trainer": "distillclip_tpu.training.trainer",
        "LCLIPScorer": "distillclip_tpu.serving.lclip_score",
        "LossCalculator": "distillclip_tpu.losses.calculator",
        "CLIPModel": "distillclip_tpu.models.clip",
        "teacher_load": "distillclip_tpu.models.teacher",
        "MainDataModule": "distillclip_tpu.data.datamodule",
    }
    if name in lazy:
        import importlib

        return getattr(importlib.import_module(lazy[name]), name)
    raise AttributeError(f"module 'distillclip_tpu' has no attribute {name!r}")
