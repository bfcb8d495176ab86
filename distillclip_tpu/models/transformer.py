"""CLIP transformer stack with ``need_layers`` selection.

TPU-native equivalent of reference model/component/_common.py:98-167
(ResidualAttentionBlock + Transformer).

Layer selection (``need_layers``) is static: only the selected layers' taps
are collected and they are stacked into a single [L, ...] array, so the
student(4 selected layers) <-> teacher(12 layers, e.g. need [0,1,10,11])
alignment of the reference (config/final_config/image.yaml:30) costs one
stacked write instead of a Python list of tensors.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.layers import ClipMlp, InstrumentedAttention, LayerNorm
from distillclip_tpu.models.outputs import AttentionOutput, ControlFlags, TransformerOutput

Array = jax.Array


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attention + 4x QuickGELU MLP block (_common.py:98-127)."""

    width: int
    heads: int
    drop_prob: float = 0.0
    use_flash: bool = True
    # CLIP init-scheme stds (image_encoder.py:36-48); None -> lecun default
    attn_std: Optional[float] = None
    proj_std: Optional[float] = None
    fc_std: Optional[float] = None

    @nn.compact
    def __call__(
        self,
        x: Array,
        flags: ControlFlags,
        mask: Optional[Array] = None,
        causal: bool = False,
        kv_len: Optional[int] = None,
        deterministic: bool = True,
        seq: Optional[int] = None,
    ) -> AttentionOutput:
        from distillclip_tpu.models.layers import ln_fusion_active

        attn = InstrumentedAttention(
            width=self.width, heads=self.heads, drop_prob=self.drop_prob,
            use_flash=self.use_flash, attn_std=self.attn_std,
            proj_std=self.proj_std, name="attn",
        )
        mlp = ClipMlp(width=self.width, fc_std=self.fc_std,
                      proj_std=self.proj_std, name="mlp")
        ln_1 = LayerNorm(name="ln_1")
        ln_2 = LayerNorm(name="ln_2")
        if ln_fusion_active(x):
            # pre-LNs folded into the consumer kernels (qkv / c_fc); saves
            # a full [rows, C] write+read per LN (ops/fc1_act.py)
            ls1, lb1 = ln_1(x, raw=True)
            attn_out = attn(x, flags, mask=mask, causal=causal, kv_len=kv_len,
                            deterministic=deterministic, seq=seq,
                            ln=(ls1, lb1, ln_1.epsilon))
            x = x + attn_out.hidden
            ls2, lb2 = ln_2(x, raw=True)
            x = x + mlp(x, ln=(ls2, lb2, ln_2.epsilon))
        else:
            attn_out = attn(ln_1(x), flags, mask=mask, causal=causal,
                            kv_len=kv_len, deterministic=deterministic, seq=seq)
            x = x + attn_out.hidden
            x = x + mlp(ln_2(x))
        return AttentionOutput(
            hidden=x,
            attention_scores=attn_out.attention_scores,
            attention_probs=attn_out.attention_probs,
            value_map=attn_out.value_map,
        )


def _stack_or_none(items: list) -> Optional[Array]:
    if not items or any(i is None for i in items):
        return None
    return jnp.stack(items, axis=0)


class Transformer(nn.Module):
    """Stack of residual blocks collecting taps for ``need_layers`` only.

    Reference: _common.py:130-167.  The loop is unrolled at trace time
    (depth <= 24 for every supported teacher), which lets the static
    need_layers membership test prune collection branches entirely.
    """

    width: int
    layers: int
    heads: int
    need_layers: Optional[Sequence[int]] = None
    drop_prob: float = 0.0
    use_flash: bool = True
    # CLIP initialization scheme (reference image_encoder.py:36-48 /
    # text_encoder.py:94-106): in_proj ~ N(0, w^-0.5), out/c_proj ~
    # N(0, w^-0.5 (2L)^-0.5), c_fc ~ N(0, (2w)^-0.5).  Default ON — both
    # reference encoders always call initialize_parameters().
    clip_init: bool = True

    def selected_layers(self) -> Sequence[int]:
        return tuple(range(self.layers)) if self.need_layers is None else tuple(self.need_layers)

    @nn.compact
    def __call__(
        self,
        x: Array,
        flags: ControlFlags,
        mask: Optional[Array] = None,
        causal: bool = False,
        kv_len: Optional[int] = None,
        deterministic: bool = True,
        seq: Optional[int] = None,
    ) -> TransformerOutput:
        # 2D rows mode: x is [B*seq, C]; LN/MLP are last-dim ops, attention
        # takes the flat kernels (taps are disabled by the caller)
        selected = set(self.selected_layers())
        scores, probs, reps = [], [], []
        value_map = None
        attn_std = self.width ** -0.5 if self.clip_init else None
        proj_std = (self.width ** -0.5) * ((2 * self.layers) ** -0.5) if self.clip_init else None
        fc_std = (2 * self.width) ** -0.5 if self.clip_init else None
        for i in range(self.layers):
            block_out = ResidualAttentionBlock(
                width=self.width,
                heads=self.heads,
                drop_prob=self.drop_prob,
                use_flash=self.use_flash,
                attn_std=attn_std,
                proj_std=proj_std,
                fc_std=fc_std,
                name=f"resblocks_{i}",
            )(x, flags, mask=mask, causal=causal, kv_len=kv_len,
              deterministic=deterministic, seq=seq)
            x = block_out.hidden
            if i not in selected:
                continue
            if flags.need_rep:
                reps.append(block_out.hidden)
            if flags.need_attn_score:
                scores.append(block_out.attention_scores)
            if flags.need_attn_prob:
                probs.append(block_out.attention_probs)
            # value_map keeps only the last *selected* layer (_common.py:166)
            value_map = block_out.value_map

        return TransformerOutput(
            hidden=x,
            attention_scores=_stack_or_none(scores),
            attention_probs=_stack_or_none(probs),
            representations=_stack_or_none(reps),
            value_map=value_map,
        )


def causal_mask(context_length: int, neg: float = -1e9) -> Array:
    """Additive causal mask (text_encoder.py:54-60), finite-negative valued.

    The reference fills with -inf; we use a large finite negative so bf16
    softmax arithmetic stays NaN-free.  Equality under softmax holds to well
    below 1e-6.
    """
    mask = jnp.full((context_length, context_length), neg, dtype=jnp.float32)
    return jnp.triu(mask, k=1)
