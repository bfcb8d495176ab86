from distillclip_tpu.training.checkpoints import (
    CheckpointManager,
    restore_pytree,
    restore_tower_params,
    save_pytree,
)
from distillclip_tpu.training.distill import DistillTask
from distillclip_tpu.training.dual import DualDistillTask
from distillclip_tpu.training.schedules import hf_cosine_with_warmup, per_epoch
from distillclip_tpu.training.train_state import (
    TrainState,
    cast_to_compute,
    count_params,
    freeze_mask,
    make_optimizer,
)

__all__ = [
    "CheckpointManager",
    "DistillTask",
    "DualDistillTask",
    "TrainState",
    "cast_to_compute",
    "count_params",
    "freeze_mask",
    "hf_cosine_with_warmup",
    "make_optimizer",
    "per_epoch",
    "restore_pytree",
    "restore_tower_params",
    "save_pytree",
]
