"""CLIP text transformer (teacher tower / plain student).

TPU-native equivalent of reference model/component/text_encoder.py.

EOT pooling uses ``argmax(tokens)`` — the EOT token id is the largest in the
vocabulary — exactly as the reference (text_encoder.py:86).  The gather is a
one-hot matmul (MXU-friendly; avoids a scatter/gather on 77-length rows).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.layers import Dense, LayerNorm
from distillclip_tpu.models.outputs import ControlFlags, TextOutput
from distillclip_tpu.models.transformer import Transformer

Array = jax.Array


def eot_pool(x: Array, tokens: Array) -> Array:
    """Select the feature at the EOT (max token id) position per row.

    x: [B, N, D], tokens: [B, N] int -> [B, D]
    """
    eot_idx = jnp.argmax(tokens, axis=-1)  # [B]
    onehot = jax.nn.one_hot(eot_idx, tokens.shape[1], dtype=x.dtype)  # [B, N]
    return jnp.einsum("bn,bnd->bd", onehot, x, preferred_element_type=jnp.float32).astype(x.dtype)


class TokenEmbedding(nn.Module):
    """Token embedding, optionally factorized (compression) per reference
    text_encoder.py:20-23 / weight_share_model.py:402-407:
    Embedding(vocab, compress_dim) -> Linear(compress_dim, width)."""

    vocab_size: int
    width: int
    compression: bool = False
    compression_dim: int = 256

    @nn.compact
    def __call__(self, tokens: Array, dtype=None) -> Array:
        """``dtype``: compute dtype for the gathered rows.

        Vocab-size tables are exempted from the step-boundary
        ``cast_to_compute`` (train_state.py) — casting the full
        [49408, width] table and converting its dense scatter-grad back
        cost a measured 0.46 ms/step on the joint trace (round 3b).
        Gathering f32 rows and casting them here is bit-identical
        (bf16(f32 row) == row of the bf16-cast table) but touches only
        the looked-up rows.
        """
        if self.compression:
            emb = nn.Embed(
                self.vocab_size,
                self.compression_dim,
                param_dtype=jnp.float32,
                embedding_init=nn.initializers.normal(stddev=0.02),
                name="embed",
            )(tokens)
            if dtype is not None and emb.dtype != dtype:
                emb = emb.astype(dtype)
            return Dense(self.width, name="expand")(emb)
        emb = nn.Embed(
            self.vocab_size,
            self.width,
            param_dtype=jnp.float32,
            embedding_init=nn.initializers.normal(stddev=0.02),
            name="embed",
        )(tokens)
        if dtype is not None and emb.dtype != dtype:
            emb = emb.astype(dtype)
        return emb


class TextTransformer(nn.Module):
    """CLIP text tower: tokens -> embed+pos -> causal Transformer -> ln_final
    -> text_projection; EOT-pooled representation.

    Reference: model/component/text_encoder.py:63-92.  Note the reference
    projects *all* tokens through text_projection (``last_layer_output``) and
    pools the projected sequence (text_encoder.py:79-86); we match that.
    """

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

    @nn.compact
    def __call__(
        self, tokens: Array, flags: ControlFlags, deterministic: bool = True
    ) -> TextOutput:
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        # the positional embedding's (possibly step-cast) dtype IS the
        # tower compute dtype; gathered vocab rows cast to it (see
        # TokenEmbedding — vocab tables skip the full-table step cast)
        emb = TokenEmbedding(
            vocab_size=self.vocab_size,
            width=self.width,
            compression=self.compression_embedding,
            compression_dim=self.embedding_compression_dim,
            name="token_embedding",
        )(tokens, dtype=positional_embedding.dtype)
        x = emb + positional_embedding.astype(emb.dtype)
        embedding = x if flags.need_emb else None

        # sequence-level pad to a sublane-aligned length (see vit.py); pad
        # keys are masked via kv_len, pad queries are causal-masked anyway
        N = x.shape[1]
        from distillclip_tpu.ops.flash_attention import (
            flash_enabled, true_n_rows_enabled,
        )

        pad_ok = (not flags.attn_tap() and not flags.need_rep
                  and flash_enabled())  # padding only pays off for kernels
        Np = -(-N // 16) * 16 if pad_ok else N

        # 2D rows mode (see vit.py); true-N keeps the tower at the real
        # token count when padding would add >5% rows (N=77->80 is 3.9%,
        # so text stays padded at the default threshold)
        B = x.shape[0]
        rows_mode = pad_ok and (deterministic or self.drop_prob == 0.0)
        true_n = (rows_mode and Np != N and true_n_rows_enabled(B * N)
                  and (Np - N) * 20 > N)
        Nrun = N if true_n else Np
        kv_len = N if (pad_ok and Nrun != N) else None
        if Nrun != N:
            x = jnp.pad(x, ((0, 0), (0, Nrun - N), (0, 0)))
        if rows_mode:
            x = x.reshape(B * Nrun, self.width)

        t_out = Transformer(
            width=self.width,
            layers=self.layers,
            heads=self.heads,
            need_layers=self.need_layers,
            drop_prob=self.drop_prob,
            name="transformer",
        )(x, flags, causal=True, kv_len=kv_len, deterministic=deterministic,
          seq=Nrun if rows_mode else None)

        hidden = t_out.hidden.reshape(B, Nrun, self.width) if rows_mode else t_out.hidden
        hidden = hidden[:, :N] if Nrun != N else hidden
        x = LayerNorm(name="ln_final")(hidden)
        text_projection = self.param(
            "text_projection",
            nn.initializers.normal(stddev=self.width ** -0.5),
            (self.width, self.output_dim),
            jnp.float32,
        )
        projected = x @ text_projection.astype(x.dtype)

        return TextOutput(
            last_representation=eot_pool(projected, tokens),
            last_layer_output=projected,
            attention_scores=t_out.attention_scores,
            attention_probs=t_out.attention_probs,
            representations=t_out.representations,
            value_map=t_out.value_map,
            embedding=embedding,
        )
