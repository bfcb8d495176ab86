"""YAML config system: multi-file deep merge + class-path injection.

TPU-native equivalent of the reference's LightningCLI/jsonargparse stack
(main.py:13-25): YAML schema {model, data, trainer} with
``class_path``/``init_args`` dependency injection of arbitrary classes
(image.yaml:1-108), multi-file override via repeated ``-c`` (share.yaml +
version.yaml, sh/run.py:23-30), and a resolved-config snapshot
(save_config_overwrite, main.py:24).

Reference-style class paths (``model.component.weight_share_model.X``,
``DistillModel``...) are aliased to our classes so the shipped
final_config YAMLs work with only data-path edits.
"""

from __future__ import annotations

import copy
import importlib
import inspect
from typing import Any, Dict, List, Optional

import yaml

# reference class_path -> ours (constructor-arg renames in _ARG_RENAMES)
CLASS_ALIASES = {
    "DistillModel": "distillclip_tpu.training.distill.DistillTask",
    "DualDistillModel": "distillclip_tpu.training.dual.DualDistillTask",
    "MainDataModule": "distillclip_tpu.data.datamodule.MainDataModule",
    "model.distil_model.DistillModel": "distillclip_tpu.training.distill.DistillTask",
    "model.dual_distill_model.DualDistillModel": "distillclip_tpu.training.dual.DualDistillTask",
    "data.main_datamodule.MainDataModule": "distillclip_tpu.data.datamodule.MainDataModule",
    "data.text_image_datamodule.TextImageDataModule":
        "distillclip_tpu.data.component.text_image_webdataset.TextImageDataModule",
    "model.component.weight_share_model.RepeatVisionTransformer":
        "distillclip_tpu.models.repeat_vit.RepeatVisionTransformer",
    "model.component.weight_share_model.RepeatTextTransformer":
        "distillclip_tpu.models.repeat_vit.RepeatTextTransformer",
    "model.component.image_encoder.ImageEncoder":
        "distillclip_tpu.models.encoders.ImageEncoder",
    "model.component.text_encoder.TextEncoder":
        "distillclip_tpu.models.encoders.TextEncoder",
}

_ARG_RENAMES = {
    "distillclip_tpu.training.distill.DistillTask": {"student_encoder": "student"},
}

# constructor args accepted by the reference but meaningless here; dropped
# silently when their value is null/default
_DROPPABLE_IF_NONE = {"hybrid_backbone", "qk_scale"}


def deep_merge(base: Dict, override: Dict) -> Dict:
    """Recursive dict merge; override wins; lists replace wholesale."""
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def load_configs(paths: List[str]) -> Dict:
    merged: Dict = {}
    for path in paths:
        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        merged = deep_merge(merged, cfg)
    return merged


def resolve_class(class_path: str):
    class_path = CLASS_ALIASES.get(class_path, class_path)
    module_name, _, cls_name = class_path.rpartition(".")
    if not module_name:
        raise ValueError(f"cannot resolve bare class name {class_path!r}")
    module = importlib.import_module(module_name)
    return getattr(module, cls_name), class_path


def instantiate(node: Any) -> Any:
    """Recursively build objects from {class_path, init_args} nodes."""
    if isinstance(node, dict):
        if "class_path" in node:
            cls, canonical = resolve_class(node["class_path"])
            raw_args = node.get("init_args", {}) or {}
            kwargs = {}
            renames = _ARG_RENAMES.get(canonical, {})
            for k, v in raw_args.items():
                k = renames.get(k, k)
                v = instantiate(v)
                if k in _DROPPABLE_IF_NONE and v is None:
                    continue
                kwargs[k] = v
            # rpe_config dicts -> RpeConfig
            if "rpe_config" in kwargs and isinstance(kwargs["rpe_config"], dict):
                from distillclip_tpu.models.irpe import rpe_config_from_dict

                kwargs["rpe_config"] = rpe_config_from_dict(kwargs["rpe_config"])
            sig = inspect.signature(cls.__init__)
            accepts_kwargs = any(
                p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
            )
            if not accepts_kwargs:
                unknown = [k for k in kwargs if k not in sig.parameters]
                for k in unknown:
                    if kwargs[k] is None:
                        kwargs.pop(k)
                    else:
                        raise TypeError(
                            f"{canonical} got unexpected config argument {k!r}"
                        )
            return cls(**kwargs)
        return {k: instantiate(v) for k, v in node.items()}
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


# ---------------------------------------------------------------------------
# trainer-section translation (Lightning keys -> our Trainer)
# ---------------------------------------------------------------------------

_TRAINER_KEYS = {
    "max_epochs": "max_epochs",
    "check_val_every_n_epoch": "check_val_every_n_epoch",
    "log_every_n_steps": "log_every_n_steps",
    "limit_train_batches": "limit_train_batches",
    "limit_val_batches": "limit_val_batches",
    "default_root_dir": "result_dir",
    "profiler": "profiler",
    "save_every_n_steps": "save_every_n_steps",
    "accumulate_grad_batches": "accumulate_grad_batches",
}


def build_trainer(trainer_cfg: Optional[Dict], seed: int = 2022):
    """Map the reference trainer section onto our Trainer.

    Lightning-only keys (accelerator/strategy/precision/...) are recorded
    but ignored: device placement and precision are decided by the task +
    mesh (bf16 on TPU replaces 'precision: 16').
    """
    from distillclip_tpu.training.trainer import Trainer

    trainer_cfg = dict(trainer_cfg or {})
    kwargs: Dict[str, Any] = {"seed": seed}
    for src, dst in _TRAINER_KEYS.items():
        if trainer_cfg.get(src) is not None:
            kwargs[dst] = trainer_cfg[src]

    run_name = "run"
    logger_cfg = trainer_cfg.get("logger")
    if isinstance(logger_cfg, dict):
        init = logger_cfg.get("init_args", {}) or {}
        run_name = init.get("name", run_name) or run_name
        if init.get("dir"):
            kwargs.setdefault("result_dir", init["dir"])
    kwargs["run_name"] = str(run_name).replace("/", "_").replace(" ", "_")

    for cb in trainer_cfg.get("callbacks", []) or []:
        if not isinstance(cb, dict):
            continue
        path = cb.get("class_path", "")
        if path.endswith("EarlyStopping"):
            init = cb.get("init_args", {}) or {}
            kwargs["early_stopping_monitor"] = init.get("monitor", "val_loss/loss")
            kwargs["early_stopping_patience"] = init.get("patience", 10)
    return Trainer(**kwargs)


def save_resolved_config(cfg: Dict, out_path: str):
    with open(out_path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
