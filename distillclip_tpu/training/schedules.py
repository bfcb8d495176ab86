"""LR schedules.

The reference uses HuggingFace ``get_cosine_schedule_with_warmup`` stepped
once per EPOCH (main.py:15-21 'interval: epoch'; distil_model.py:160-169
with warm_steps/total_steps counted in epochs).  We reproduce that exactly:
the per-step learning rate is a function of ``step // steps_per_epoch``.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def hf_cosine_with_warmup(
    base_lr: float,
    warmup_units: int,
    total_units: int,
    num_cycles: float = 0.5,
) -> Callable:
    """HF transformers cosine-with-warmup multiplier * base_lr.

    lr(u) = base * u / warmup                      for u < warmup
          = base * max(0, 0.5 (1 + cos(pi * 2c * p)))   otherwise,
    p = (u - warmup) / (total - warmup).
    """

    def schedule(unit):
        unit = jnp.asarray(unit, jnp.float32)
        warm = jnp.maximum(1.0, float(warmup_units))
        progress = (unit - warmup_units) / max(1, total_units - warmup_units)
        cos_val = jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * num_cycles * 2.0 * progress))
        )
        return base_lr * jnp.where(unit < warmup_units, unit / warm, cos_val)

    return schedule


def per_epoch(schedule: Callable, steps_per_epoch: int) -> Callable:
    """Wrap an epoch-indexed schedule as a step-indexed optax schedule."""

    def step_schedule(step):
        return schedule(step // max(1, steps_per_epoch))

    return step_schedule
