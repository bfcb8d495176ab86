"""Dual-tower CLIP model producing cosine contrastive logits.

TPU-native equivalent of reference model/component/clip_model.py.

Like the reference there is NO learnable logit scale — i2t/t2i logits are raw
cosine similarities (clip_model.py:36-44).  The ``only_last_rep`` fast path
(clip_model.py:45-49) is the L-CLIPScore inference path: encode both towers,
L2-normalize, similarity.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.outputs import CLIPOutput, ControlFlags

Array = jax.Array


def l2_normalize(x: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """x / ||x|| matching torch's ``x / x.norm(dim, keepdim=True)`` (no eps)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x.astype(jnp.float32) / norm).astype(x.dtype)


class CLIPModel(nn.Module):
    """Dual tower wrapper. ``image_tower`` / ``text_tower`` are any modules
    returning VisionOutput / TextOutput (plain encoders or weight-share
    students)."""

    image_tower: nn.Module
    text_tower: nn.Module

    def encode_image(self, images: Array, flags: ControlFlags, deterministic: bool = True):
        return self.image_tower(images, flags, deterministic=deterministic)

    def encode_text(self, tokens: Array, flags: ControlFlags, deterministic: bool = True):
        return self.text_tower(tokens, flags, deterministic=deterministic)

    def __call__(
        self,
        tokens: Array,
        images: Array,
        flags: ControlFlags,
        deterministic: bool = True,
    ) -> CLIPOutput:
        visual_output = self.encode_image(images, flags, deterministic=deterministic)
        text_output = self.encode_text(tokens, flags, deterministic=deterministic)
        image_feature = l2_normalize(visual_output.last_representation)
        text_feature = l2_normalize(text_output.last_representation)
        logits = jnp.einsum(
            "id,td->it", image_feature, text_feature, preferred_element_type=jnp.float32
        )
        return CLIPOutput(
            visual_output=visual_output,
            text_output=text_output,
            i2t_logits=logits,
            t2i_logits=logits.T,
        )

    def score(
        self, tokens: Array, images: Array, deterministic: bool = True
    ) -> Tuple[Array, Array, Array]:
        """L-CLIPScore fast path (clip_model.py:45-49 ``only_last_rep``):
        returns (image_features, text_features, cosine logits)."""
        flags = ControlFlags()
        image_feature = l2_normalize(
            self.encode_image(images, flags, deterministic=deterministic).last_representation
        )
        text_feature = l2_normalize(
            self.encode_text(tokens, flags, deterministic=deterministic).last_representation
        )
        logits = jnp.einsum(
            "id,td->it", image_feature, text_feature, preferred_element_type=jnp.float32
        )
        return image_feature, text_feature, logits
