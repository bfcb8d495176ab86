"""ViTKD loss — the only distillation loss with trainable parameters.

Reference: model/loss_component/vit_kd.py (ViTKD: Practical Guidelines for
ViT feature knowledge distillation).

Components (reference lines):
* low-layer "mimicking": per-layer Linear align + MSE (:86-98)
* high-layer "generation": random token masking (:5-32), learned mask token,
  2x Conv3x3 generation head, masked MSE (:100-135)

Modeled as a flax module whose variables live in the train state beside the
student (SURVEY.md §7 step 3).  The random mask draws from the 'mask' rng
stream.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def random_masking(rng: Array, x: Array, mask_ratio: float) -> Tuple[Array, Array]:
    """Per-sample random masking (vit_kd.py:5-32).

    Returns (x_masked, mask) where masked tokens are replaced later via the
    caller's mask token and ``mask`` is 1 for removed tokens, in ORIGINAL
    token order.  Instead of the reference's gather/scatter shuffle dance we
    draw the same distribution directly: a uniform random permutation keeps
    ``len_keep`` tokens — equivalently each sample keeps a uniformly random
    subset of exactly ``len_keep`` tokens.
    """
    B, N, D = x.shape
    len_keep = int(N * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (B, N))
    # rank of each token in the shuffle; rank >= len_keep => masked
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    mask = (ids_restore >= len_keep).astype(x.dtype)  # [B, N], 1 = removed
    return mask


class ViTKDLoss(nn.Module):
    """ViTKD with align linears, mask token and conv generation head."""

    student_dims: int
    teacher_dims: int
    alpha_vitkd: float = 0.00003
    beta_vitkd: float = 0.000003
    lambda_vitkd: float = 0.5
    low_layers_num: int = 2
    high_layers_num: int = 1

    @nn.compact
    def __call__(self, preds_s: Sequence[Array], preds_t: Sequence[Array]) -> Array:
        """preds_s/preds_t: [low [B, low_n, N, D], high [B, high_n, N, D]]."""
        low_s, high_s = preds_s
        low_t, high_t = preds_t
        B = low_s.shape[0]
        need_align = self.student_dims != self.teacher_dims

        # --- Mimicking (vit_kd.py:86-98) ---
        low_parts = []
        for i in range(self.low_layers_num):
            rep = low_s[:, i].astype(jnp.float32)
            if need_align:
                rep = nn.Dense(
                    self.teacher_dims, param_dtype=jnp.float32, name=f"align_low_{i}"
                )(rep)
            low_parts.append(rep[:, None])
        low_x = jnp.concatenate(low_parts, axis=1)
        loss_lr = (
            jnp.sum(jnp.square(low_x - low_t.astype(jnp.float32))) / B * self.alpha_vitkd
        )

        # --- Generation (vit_kd.py:100-135) ---
        mask_token = self.param(
            "mask_token", nn.initializers.zeros, (1, 1, self.teacher_dims), jnp.float32
        )
        loss_gen = 0.0
        for i in range(self.high_layers_num):
            x = high_s[:, i].astype(jnp.float32)
            if need_align:
                x = nn.Dense(
                    self.teacher_dims, param_dtype=jnp.float32, name=f"align_high_{i}"
                )(x)
            tea = high_t[:, i].astype(jnp.float32)
            # drop cls token (:118-119)
            x = x[:, 1:, :]
            tea = tea[:, 1:, :]
            Bi, N, D = x.shape
            mask = random_masking(self.make_rng("mask"), x, self.lambda_vitkd)  # [B, N]
            x = jnp.where(mask[:, :, None] > 0, mask_token.astype(x.dtype), x)

            hw = int(N ** 0.5)
            g = x.reshape(Bi, hw, hw, D)  # NHWC
            g = nn.Conv(self.teacher_dims, (3, 3), padding=1, param_dtype=jnp.float32,
                        name=f"generation_conv1_{i}")(g)
            g = jax.nn.relu(g)
            g = nn.Conv(self.teacher_dims, (3, 3), padding=1, param_dtype=jnp.float32,
                        name=f"generation_conv2_{i}")(g)
            g = g.reshape(Bi, N, D)

            m = mask[:, :, None]
            l_gen = jnp.sum(jnp.square(g * m - tea * m))
            loss_gen = loss_gen + l_gen / Bi * self.beta_vitkd / self.lambda_vitkd
        loss_gen = loss_gen / self.high_layers_num

        return loss_lr + loss_gen
