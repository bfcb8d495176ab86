"""Train state + optimizer construction with mask-based freezing.

The reference freezes/unfreezes by mutating ``requires_grad``
(distil_model.py:197-221, dual_distill_model.py:230-268).  The JAX-native
equivalent is an ``optax.masked`` zero-update transform over a boolean
pytree — parameters stay in the state, their updates are zeroed, and
"unfreezing" swaps in an optimizer built with a different mask (one re-jit
at the epoch boundary, SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array
Params = Any


def apply_mask(tree: Params, mask: Optional[Params]) -> Params:
    """Zero leaves whose mask is False.

    The mask holds *Python* bools, so the select resolves at trace time:
    frozen leaves become constants and XLA never materializes their math.
    """
    if mask is None:
        return tree
    return jax.tree_util.tree_map(
        lambda m, x: x if m else jnp.zeros_like(x), mask, tree
    )


@struct.dataclass
class TrainState:
    """Minimal train state: step counter, params, optimizer state."""

    step: Array
    params: Params
    opt_state: Any

    def apply_gradients(
        self,
        grads: Params,
        tx: optax.GradientTransformation,
        trainable_mask: Optional[Params] = None,
    ) -> "TrainState":
        """Optimizer step with trace-time freeze masking.

        Grad AND update masking: masking only grads would still let AdamW's
        decoupled weight decay move frozen parameters.

        The optimization barrier between backward and optimizer is a TPU
        layout fix: without it XLA fuses the AdamW elementwise chain into
        the dW matmuls' output, forcing f32 3-output window configs that run
        the SAME dW dot ~40% slower (text-step trace: fc2 dW 3.42 ms fused
        vs 2.45 ms plain; backend_config estimated_cycles 8.3M vs 4.2M).
        AdamW then runs as its own bandwidth-bound loop fusion, which is
        what the cost model expects it to be.
        """
        if jax.default_backend() in ("tpu", "axon"):
            grads = jax.lax.optimization_barrier(grads)
        grads = apply_mask(grads, trainable_mask)
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        updates = apply_mask(updates, trainable_mask)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)


def path_str(path) -> str:
    """KeyPath -> 'a/b/c' string for prefix matching."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def freeze_mask(
    params: Params,
    frozen_paths: Sequence[str] = (),
    frozen_prefixes: Sequence[str] = (),
) -> Params:
    """Boolean pytree: True = trainable, False = frozen.

    ``frozen_paths`` match exactly; ``frozen_prefixes`` match startswith —
    the TPU equivalent of the reference's name-prefix freezing
    (dual_distill_model.py:253-261 freeze_with_prefix).
    """
    frozen_paths = set(frozen_paths)
    prefixes = tuple(frozen_prefixes)

    def label(path, _):
        s = path_str(path)
        if s in frozen_paths:
            return False
        return not any(s.startswith(p) for p in prefixes)

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate: Callable,
    weight_decay: float = 1e-3,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip_norm: Optional[float] = None,
    accumulate_steps: int = 1,
) -> optax.GradientTransformation:
    """AdamW matching torch defaults (distil_model.py:160-162).

    Like torch AdamW with ``filter(requires_grad)``, weight decay applies to
    every trainable parameter (the reference does not exclude LN/bias).
    Freezing is applied by :meth:`TrainState.apply_gradients` via a static
    mask — not ``optax.masked`` — so the jitted graph keeps one uniform
    structure (and trace-time constants for frozen leaves).

    ``accumulate_steps > 1`` wraps the chain in :class:`optax.MultiSteps`
    (mean of the micro-batch grads, one optimizer update every k steps) —
    Lightning's ``accumulate_grad_batches``
    (reference config/final_config/l_clip.yaml:58, set to 1 there).
    """
    chain = []
    if grad_clip_norm is not None:
        chain.append(optax.clip_by_global_norm(grad_clip_norm))
    chain.append(
        optax.adamw(learning_rate=learning_rate, b1=b1, b2=b2, eps=eps,
                    weight_decay=weight_decay)
    )
    tx = optax.chain(*chain)
    if accumulate_steps and accumulate_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=int(accumulate_steps))
    return tx


def count_params(params: Params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def prepare_inputs(inputs: Array, dtype) -> Array:
    """Cast step inputs to the compute dtype; uint8 images are normalized
    ON DEVICE ((x/255 - mean)/std in f32, then cast) so datasets can ship
    raw pixels — 4x less host->device transfer than normalized fp32.
    Arithmetic matches the host pipeline (transforms.to_normalized_array)
    to f32 rounding.  Integer token tensors pass through unchanged.
    """
    if inputs.dtype == jnp.uint8:
        from distillclip_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD

        x = inputs.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGE_MEAN, jnp.float32)) / jnp.asarray(
            IMAGE_STD, jnp.float32
        )
        return x.astype(dtype)
    if jnp.issubdtype(inputs.dtype, jnp.floating):
        return inputs.astype(dtype)
    return inputs


# Vocab-size embedding tables are exempt from the step-boundary cast:
# TokenEmbedding gathers f32 rows and casts them to the compute dtype
# instead (bit-identical to gathering from a bf16-cast table).  Casting the
# full [49408, 768] table forward and converting its dense scatter-grad
# back to f32 cost a measured 0.46 ms/step on the joint trace (round 3b).
# 16384 rows is far above every non-vocab 2D param (largest: patch_kernel
# [3072, 768]) and far below the CLIP vocab (49408).
EMBED_CAST_SKIP_ROWS = 16384


def cast_to_compute(params: Params, dtype=jnp.bfloat16) -> Params:
    """Cast fp32 params to the compute dtype for the forward pass.

    Master weights stay fp32 in the state (the reference's fp16 AMP keeps
    fp32 master weights the same way, image.yaml:69 'precision: 16').
    fp32 LayerNorm internals are preserved by the modules themselves.
    """

    def cast(x):
        if x.dtype != jnp.float32:
            return x
        if x.ndim == 2 and x.shape[0] >= EMBED_CAST_SKIP_ROWS:
            return x  # vocab embedding table: rows cast after the gather
        return x.astype(dtype)

    return jax.tree_util.tree_map(cast, params)
