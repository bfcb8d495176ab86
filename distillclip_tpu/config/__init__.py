from distillclip_tpu.config.loader import (
    CLASS_ALIASES,
    build_trainer,
    deep_merge,
    instantiate,
    load_configs,
    resolve_class,
    save_resolved_config,
)

__all__ = [
    "CLASS_ALIASES",
    "build_trainer",
    "deep_merge",
    "instantiate",
    "load_configs",
    "resolve_class",
    "save_resolved_config",
]
