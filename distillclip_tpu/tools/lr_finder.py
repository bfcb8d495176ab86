"""LR range test (Lightning ``auto_lr_find`` equivalent).

The reference's template generator emits trainer templates with
``auto_lr_find: True`` (reference sh/gene_template.py:104), which Lightning
executes as an LR range test before fitting: sweep the learning rate
exponentially from ``min_lr`` to ``max_lr`` over ``num_steps`` train steps,
record the (smoothed) loss, stop early on divergence, and suggest the lr
at the steepest descent of the smoothed curve.

TPU-native version: the sweep IS the optimizer's lr schedule — one jitted
train step, compiled once, stepped ``num_steps`` times; no per-step re-jit.

CLI: ``distillclip lr_find -c config.yaml [--min-lr --max-lr --steps]``.
The version-sweep template (``tools/experiments.py cmd_template 'l'``)
remains the supported alternative for full-run sweeps.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def exponential_sweep(min_lr: float, max_lr: float, num_steps: int):
    """lr(step) = min_lr * (max_lr/min_lr) ** (step / (num_steps - 1))."""
    ratio = max_lr / min_lr

    def schedule(count):
        frac = jnp.minimum(count, num_steps - 1) / max(num_steps - 1, 1)
        return min_lr * ratio ** frac

    return schedule


def suggest_from_history(lrs, losses, skip_begin: int = 10, skip_end: int = 1,
                         smooth: float = 0.05) -> Optional[float]:
    """Lightning's suggestion rule: lr at the minimum gradient of the
    EWMA-smoothed loss, ignoring the sweep's edges."""
    # drop non-finite tail entries (diverged sweep): NaN would propagate
    # through the EWMA/gradient and argmin would land AT the divergence lr
    # instead of the steepest descent (advisor r4; mirrors Lightning)
    finite = [(lr, l) for lr, l in zip(lrs, losses) if math.isfinite(l)]
    if not finite:
        return None
    lrs, losses = zip(*finite)
    if len(losses) < skip_begin + skip_end + 2:
        skip_begin, skip_end = 1, 1
    if len(losses) < skip_begin + skip_end + 2:
        return None
    smoothed = []
    avg = 0.0
    for i, l in enumerate(losses):
        avg = smooth * l + (1 - smooth) * avg
        smoothed.append(avg / (1 - (1 - smooth) ** (i + 1)))  # bias-corrected
    seg = np.array(smoothed[skip_begin: len(smoothed) - skip_end])
    if len(seg) < 2:
        return None
    idx = int(np.argmin(np.gradient(seg))) + skip_begin
    return float(lrs[idx])


def lr_find(task, datamodule, min_lr: float = 1e-7, max_lr: float = 1.0,
            num_steps: int = 100, seed: int = 2022,
            early_stop_threshold: float = 4.0) -> Dict[str, Any]:
    """Run the range test; returns {suggestion, lrs, losses, diverged_at}."""
    from distillclip_tpu.parallel.mesh import create_mesh, shard_batch
    from distillclip_tpu.training.train_state import make_optimizer

    mesh = create_mesh()
    datamodule.prepare_data()
    datamodule.setup("fit")
    train_loader = datamodule.train_dataloader()
    dual = hasattr(task, "image_student")
    rng = jax.random.PRNGKey(seed)
    teacher_cv = getattr(task, "teacher_compute_vars", task.teacher_vars)

    sample = next(iter(train_loader))
    if dual:
        state, _ = task.init_state(
            rng, jnp.asarray(sample["tokens"][:1]),
            jnp.asarray(sample["images"][:1]), num_steps,
        )
    else:
        state, _ = task.init_state(rng, jnp.asarray(sample["inputs"][:1]), num_steps)

    # swap in the sweep schedule (same AdamW/clip config as the task)
    sweep_tx = make_optimizer(
        exponential_sweep(min_lr, max_lr, num_steps),
        weight_decay=task.weight_decay,
        grad_clip_norm=task.grad_clip_norm,
    )
    state = state.replace(opt_state=sweep_tx.init(state.params))
    step_fn = task.make_train_step(mesh, sweep_tx)

    lrs, losses = [], []
    best = math.inf
    diverged_at = None
    step = 0
    sched = exponential_sweep(min_lr, max_lr, num_steps)
    while step < num_steps:
        for batch in train_loader:
            if step >= num_steps:
                break
            batch = shard_batch(mesh, batch)
            if dual:
                state, metrics = step_fn(
                    state, teacher_cv, batch["tokens"], batch["images"], rng
                )
            else:
                state, metrics = step_fn(state, teacher_cv, batch["inputs"], rng)
            loss = float(np.asarray(metrics["loss"]))
            lrs.append(float(sched(step)))
            losses.append(loss)
            step += 1
            if math.isfinite(loss):
                best = min(best, loss)
            if not math.isfinite(loss) or (
                early_stop_threshold and loss > early_stop_threshold * best
            ):
                diverged_at = lrs[-1]
                step = num_steps  # stop: past the useful range (Lightning rule)
                break
        else:
            # single-shot loaders: refresh for another pass
            train_loader = datamodule.train_dataloader()

    return {
        "suggestion": suggest_from_history(lrs, losses),
        "lrs": lrs,
        "losses": losses,
        "diverged_at": diverged_at,
    }
