from distillclip_tpu.config.loader import (
    CLASS_ALIASES,
    build_trainer,
    deep_merge,
    instantiate,
    load_configs,
    resolve_class,
    save_resolved_config,
)
from distillclip_tpu.config.perf import PERF_KNOBS, apply_perf_config

__all__ = [
    "CLASS_ALIASES",
    "PERF_KNOBS",
    "apply_perf_config",
    "build_trainer",
    "deep_merge",
    "instantiate",
    "load_configs",
    "resolve_class",
    "save_resolved_config",
]
