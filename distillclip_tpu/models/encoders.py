"""Encoder wrappers: student width-projections + attention-score cleanup.

TPU-native equivalents of reference model/component/image_encoder.py and the
wrapper half of text_encoder.py.

Students whose width differs from the teacher's get ``embedding_projection``
and ``hidden_projection`` Linear(width -> teacher_width) applied to the
post-positional embedding and per-layer hidden representations
(image_encoder.py:54-59, text_encoder.py:75-80).

Deliberate fix vs. reference (documented deviation): the reference
TextEncoder decides ``no_trans`` by comparing *layer count* to teacher width
(text_encoder.py:43, an evident typo); we compare widths for both towers.

Attention-score cleanup: masked (-inf in the reference) score entries are
zeroed before the scores reach feature-matching losses
(image_encoder.py:61-63).  Our masks use -1e9, so cleanup zeroes anything
below -1e8.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.layers import Dense
from distillclip_tpu.models.outputs import ControlFlags, TextOutput, VisionOutput
from distillclip_tpu.models.text import TextTransformer
from distillclip_tpu.models.vit import VisionTransformer

Array = jax.Array

_MASK_CLEAN_THRESHOLD = -1e8


def clean_masked_scores(scores: Optional[Array]) -> Optional[Array]:
    """Zero out additive-mask entries in attention scores ([L,B,H,N,N])."""
    if scores is None:
        return None
    return jnp.where(scores <= _MASK_CLEAN_THRESHOLD, jnp.zeros_like(scores), scores)


class ImageEncoder(nn.Module):
    """CLIP vision tower + (student-only) width projections.

    Reference: model/component/image_encoder.py.
    """

    is_student: bool
    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    need_layers: Optional[Sequence[int]] = None
    drop_prob: float = 0.0
    teacher_width: Optional[int] = None

    @property
    def selected_layers(self) -> Sequence[int]:
        return tuple(range(self.layers)) if self.need_layers is None else tuple(self.need_layers)

    @nn.compact
    def __call__(
        self, images: Array, flags: ControlFlags, deterministic: bool = True
    ) -> VisionOutput:
        out = VisionTransformer(
            input_resolution=self.input_resolution,
            patch_size=self.patch_size,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            output_dim=self.output_dim,
            need_layers=self.need_layers,
            drop_prob=self.drop_prob,
            name="visual",
        )(images, flags, deterministic=deterministic)

        project = (
            self.is_student
            and self.teacher_width is not None
            and self.teacher_width != self.width
        )
        reps, emb = out.representations, out.embedding
        if project:
            if flags.need_rep and reps is not None:
                reps = Dense(self.teacher_width, name="hidden_projection")(reps)
            if flags.need_emb and emb is not None:
                emb = Dense(self.teacher_width, name="embedding_projection")(emb)

        return out.replace(
            representations=reps,
            embedding=emb,
            attention_scores=clean_masked_scores(out.attention_scores)
            if flags.need_attn_score
            else None,
        )


class TextEncoder(nn.Module):
    """CLIP text tower + (student-only) width projections.

    Reference: model/component/text_encoder.py.
    """

    is_student: bool
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    heads: int = 8
    output_dim: int = 512
    need_layers: Optional[Sequence[int]] = None
    drop_prob: float = 0.0
    compression_embedding: bool = False
    embedding_compression_dim: int = 256
    teacher_width: Optional[int] = None

    @property
    def selected_layers(self) -> Sequence[int]:
        return tuple(range(self.layers)) if self.need_layers is None else tuple(self.need_layers)

    @nn.compact
    def __call__(
        self, tokens: Array, flags: ControlFlags, deterministic: bool = True
    ) -> TextOutput:
        out = TextTransformer(
            vocab_size=self.vocab_size,
            context_length=self.context_length,
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            output_dim=self.output_dim,
            need_layers=self.need_layers,
            drop_prob=self.drop_prob,
            compression_embedding=self.compression_embedding,
            embedding_compression_dim=self.embedding_compression_dim,
            name="text",
        )(tokens, flags, deterministic=deterministic)

        project = (
            self.is_student
            and self.teacher_width is not None
            and self.teacher_width != self.width
        )
        reps, emb = out.representations, out.embedding
        if project:
            if flags.need_rep and reps is not None:
                reps = Dense(self.teacher_width, name="hidden_projection")(reps)
            if flags.need_emb and emb is not None:
                emb = Dense(self.teacher_width, name="embedding_projection")(emb)

        return out.replace(
            representations=reps,
            embedding=emb,
            attention_scores=clean_masked_scores(out.attention_scores)
            if flags.need_attn_score
            else None,
        )
