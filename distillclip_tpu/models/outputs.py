"""Typed output containers threaded through every model forward.

TPU-native re-design of the reference's ``ControlOutput`` + per-model output
dataclasses (reference: model/component/output.py:7-73).

Two kinds of objects live here:

* :class:`ControlFlags` — a *static*, hashable, frozen dataclass of booleans.
  It is passed to modules as a regular Python value (NOT a traced array), so
  each distinct flag combination produces one trace and XLA prunes every
  disabled instrumentation branch at compile time.  This mirrors the
  reference's fixed ``need_return_para`` (reference: model/distil_model.py:52)
  where the flag set is constant for a whole training run.

* Output pytrees — ``flax.struct`` dataclasses whose optional fields are
  ``None`` when the corresponding flag is off.  ``None`` leaves vanish from
  the pytree, so jit signatures stay minimal.

Per-layer collections (attention scores / probs / hidden representations) are
stored as *stacked arrays* with a leading ``layers`` axis rather than Python
lists: static shapes, single fused HBM write, and loss kernels can reduce over
the layer axis in one pass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
from flax import struct

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class ControlFlags:
    """Static switches controlling which instrumentation a forward returns.

    Mirrors reference ControlOutput (model/component/output.py:7-13):
    need_emb / need_attn_score / need_value_map / need_attn_prob / need_rep.
    """

    need_emb: bool = False
    need_attn_score: bool = False
    need_value_map: bool = False
    need_attn_prob: bool = False
    need_rep: bool = False
    # full projected sequence (``last_layer_output``) — only the fine_grain
    # loss reads it; when False the repeat towers pool FIRST and run the
    # final norm+head on one row per sample instead of all N (the reference
    # always projects all tokens, text_encoder.py:79-86 — identical math
    # for the pooled row since LN/dense are per-row)
    need_last_layer: bool = False

    def any_tap(self) -> bool:
        """True if any instrumentation is requested.

        When False the encoders may take the fast path (e.g. Pallas flash
        attention) since only final representations are needed.
        """
        return (
            self.need_emb
            or self.need_attn_score
            or self.need_value_map
            or self.need_attn_prob
            or self.need_rep
        )

    def attn_tap(self) -> bool:
        """True if the attention inner state must be materialized."""
        return self.need_attn_score or self.need_attn_prob or self.need_value_map


@struct.dataclass
class AttentionOutput:
    """Single attention layer output (reference output.py:38-43)."""

    hidden: Array
    attention_scores: Optional[Array] = None  # [B, H, N, N] pre-softmax (scaled)
    attention_probs: Optional[Array] = None  # [B, H, N, N] post-softmax
    value_map: Optional[Array] = None  # [B, H, N, N] softmax(V V^T / sqrt(d))


@struct.dataclass
class TransformerOutput:
    """Transformer stack output (reference output.py:46-52).

    Per-layer tensors are stacked over a leading ``layers`` axis and contain
    only the layers selected by ``need_layers``.
    """

    hidden: Array
    attention_scores: Optional[Array] = None  # [L, B, H, N, N]
    attention_probs: Optional[Array] = None  # [L, B, H, N, N]
    representations: Optional[Array] = None  # [L, B, N, D]
    value_map: Optional[Array] = None  # [B, H, N, N] (last selected layer)


@struct.dataclass
class VisionOutput:
    """Vision tower output (reference output.py:16-24)."""

    last_representation: Array  # [B, out_dim] (cls token)
    last_layer_output: Array  # [B, N, out_dim]
    attention_scores: Optional[Array] = None
    attention_probs: Optional[Array] = None
    representations: Optional[Array] = None
    value_map: Optional[Array] = None
    embedding: Optional[Array] = None  # [B, N, D] post-positional embeddings


@struct.dataclass
class TextOutput:
    """Text tower output (reference output.py:27-35)."""

    last_representation: Array  # [B, out_dim] (EOT token)
    last_layer_output: Array  # [B, N, out_dim]
    attention_scores: Optional[Array] = None
    attention_probs: Optional[Array] = None
    representations: Optional[Array] = None
    value_map: Optional[Array] = None
    embedding: Optional[Array] = None


@struct.dataclass
class CLIPOutput:
    """Dual tower output with contrastive logits (reference output.py:62-68).

    Like the reference, logits are raw cosine similarities — the model has no
    learnable logit scale (reference clip_model.py:36-44).
    """

    visual_output: VisionOutput
    text_output: TextOutput
    i2t_logits: Array  # [B_img, B_txt]
    t2i_logits: Array  # [B_txt, B_img]


TowerOutput = VisionOutput  # alias for typing unions in loss code
