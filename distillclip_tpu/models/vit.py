"""CLIP Vision Transformer (teacher tower / plain student).

TPU-native equivalent of reference model/component/_common.py:170-221.

The patchify convolution is expressed as reshape + one [P*P*3, width] matmul:
for non-overlapping stride-P patches this is mathematically identical to the
Conv2d and maps directly onto the MXU with no im2col.  Images are NHWC (TPU
native layout); the teacher-weight converter transposes OIHW conv kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.layers import LayerNorm
from distillclip_tpu.models.outputs import ControlFlags, VisionOutput
from distillclip_tpu.models.transformer import Transformer

Array = jax.Array


def patchify(images: Array, patch_size: int) -> Array:
    """[B, H, W, C] -> [B, (H/P)*(W/P), P*P*C] with (ph, pw, c) pixel order.

    The flatten order matches torch Conv2d weight layout after OIHW->(kh kw I)O
    reshaping, so converted teacher weights drop in exactly.
    """
    B, H, W, C = images.shape
    P = patch_size
    gh, gw = H // P, W // P
    x = images.reshape(B, gh, P, gw, P, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, gh, gw, P, P, C]
    return x.reshape(B, gh * gw, P * P * C)


class VisionTransformer(nn.Module):
    """CLIP ViT: patchify -> cls+pos -> ln_pre -> Transformer -> ln_post -> proj.

    Reference: _common.py:170-221.  Returns the cls-token representation as
    ``last_representation`` (_common.py:215).
    """

    input_resolution: int = 224
    patch_size: int = 32
    width: int = 768
    layers: int = 12
    heads: int = 12
    output_dim: int = 512
    need_layers: Optional[Sequence[int]] = None
    drop_prob: float = 0.0

    @nn.compact
    def __call__(
        self, images: Array, flags: ControlFlags, deterministic: bool = True
    ) -> VisionOutput:
        B = images.shape[0]
        P = self.patch_size
        scale = self.width ** -0.5
        n_patches = (self.input_resolution // P) ** 2
        if images.shape[1] != self.input_resolution or images.shape[2] != self.input_resolution:
            raise ValueError(
                f"VisionTransformer(input_resolution={self.input_resolution}) "
                f"got images of shape {tuple(images.shape)} (expected NHWC "
                f"with H=W={self.input_resolution})"
            )

        # conv1 as a patch matmul (no bias, matching CLIP's Conv2d bias=False)
        patch_kernel = self.param(
            "patch_kernel",
            nn.initializers.normal(stddev=scale),
            (P * P * 3, self.width),
            jnp.float32,
        )
        x = patchify(images, P) @ patch_kernel.astype(images.dtype)

        # stds follow the reference's initialize_parameters override
        # (image_encoder.py:36-38: class 0.02, positional 0.01), not the
        # constructor-time width^-0.5 it immediately overwrites
        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(stddev=0.02), (self.width,), jnp.float32
        )
        positional_embedding = self.param(
            "positional_embedding",
            nn.initializers.normal(stddev=0.01),
            (n_patches + 1, self.width),
            jnp.float32,
        )
        cls = jnp.broadcast_to(class_embedding.astype(x.dtype), (B, 1, self.width))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + positional_embedding.astype(x.dtype)

        embedding = x if flags.need_emb else None

        x = LayerNorm(name="ln_pre")(x)

        # Sequence-level padding: pad ONCE to a sublane-aligned length and
        # run every layer tile-aligned; the attention kernel masks the pad
        # keys via kv_len.  Skipped when per-layer taps are requested (their
        # shapes are part of the loss contract).
        N = x.shape[1]
        from distillclip_tpu.ops.flash_attention import (
            flash_enabled, true_n_rows_enabled,
        )

        pad_ok = (not flags.attn_tap() and not flags.need_rep
                  and flash_enabled())  # padding only pays off for kernels
        Np = -(-N // 16) * 16 if pad_ok else N

        # 2D rows mode: run the stack on [B*Nrun, C] so XLA keeps row-major
        # layouts on the denses (BENCH_NOTES round 3)
        rows_mode = pad_ok and (deterministic or self.drop_prob == 0.0)
        # true-N rows: keep the tower at the real token count when padding
        # would add >5% rows (ViT-B/32 teacher: 50->64 = +28% on every
        # dense); the attention kernels pad at their boundary instead.
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
        )(x, flags, mask=None, kv_len=kv_len, deterministic=deterministic,
          seq=Nrun if rows_mode else None)
        hidden = t_out.hidden.reshape(B, Nrun, self.width) if rows_mode else t_out.hidden
        hidden = hidden[:, :N] if Nrun != N else hidden
        x = LayerNorm(name="ln_post")(hidden)

        proj = self.param(
            "proj", nn.initializers.normal(stddev=scale), (self.width, self.output_dim), jnp.float32
        )
        x = x @ proj.astype(x.dtype)

        return VisionOutput(
            last_representation=x[:, 0, :],
            last_layer_output=x,
            attention_scores=t_out.attention_scores,
            attention_probs=t_out.attention_probs,
            representations=t_out.representations,
            value_map=t_out.value_map,
            embedding=embedding,
        )
