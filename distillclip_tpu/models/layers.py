"""Core layers: fp32 LayerNorm, QuickGELU, MLP, instrumented attention.

TPU-native equivalents of reference model/component/_common.py:14-127.

Mixed precision policy: parameters are stored fp32; compute runs in a
configurable ``dtype`` (bf16 by default on TPU).  LayerNorm always reduces in
fp32 and casts back (reference _common.py:14-20 does the same for fp16 AMP).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.outputs import AttentionOutput, ControlFlags

Array = jax.Array
Dtype = Any


class LayerNorm(nn.Module):
    """LayerNorm computed in fp32, result cast back to the input dtype.

    Reference: model/component/_common.py:14-20 (fp16-safe LayerNorm).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, raw: bool = False):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        if raw:
            # fused-consumer mode: the caller folds this LN into the next
            # kernel (ops/fc1_act.dense_ln / dense_act_ln); params stay
            # declared here so the param tree is identical either way
            return scale, bias
        if x.ndim == 2:
            # 2D rows mode: fused Pallas LN (XLA's convert_reduce lowering
            # of the fp32 moments runs at ~60 GB/s — BENCH_NOTES round 3)
            from distillclip_tpu.ops.layer_norm import layer_norm_rows

            return layer_norm_rows(x, scale, bias, self.epsilon)
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(orig_dtype)


def quick_gelu(x: Array) -> Array:
    """CLIP's GELU approximation x * sigmoid(1.702 x) (_common.py:23-25)."""
    return x * jax.nn.sigmoid(1.702 * x)


class Dense(nn.Dense):
    """nn.Dense with fp32 params; compute dtype follows the input."""

    def __init__(self, features, use_bias=True, kernel_init=None, bias_init=None, name=None):
        super().__init__(
            features=features,
            use_bias=use_bias,
            dtype=None,  # infer from input
            param_dtype=jnp.float32,
            kernel_init=kernel_init or nn.initializers.lecun_normal(),
            bias_init=bias_init or nn.initializers.zeros,
            name=name,
        )


def ln_fusion_active(x) -> bool:
    """Fold pre-LNs into the consumer dense kernels (2D rows mode only).

    Shared gate for the student weight-share blocks (repeat_vit) and the
    plain CLIP blocks (transformer.py) — DISTILLCLIP_FC1_LN=0 opts out.
    """
    import os

    from distillclip_tpu.ops.flash_attention import flash_enabled

    return (
        x.ndim == 2
        and flash_enabled()
        and os.environ.get("DISTILLCLIP_FC1", "kernel") == "kernel"
        and os.environ.get("DISTILLCLIP_FC1_LN", "1") != "0"
    )


class _FusedLnDense(nn.Module):
    """LN + dense via ops/fc1_act.dense_ln; param tree identical to Dense."""

    features: int
    use_bias: bool = True
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: Array, ln) -> Array:
        from distillclip_tpu.ops.fc1_act import dense_ln

        k = self.param("kernel", self.kernel_init or nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        b = (self.param("bias", self.bias_init or nn.initializers.zeros,
                        (self.features,), jnp.float32) if self.use_bias else None)
        ct = jnp.promote_types(x.dtype, k.dtype)
        ls, lb, eps = ln
        return dense_ln(x.astype(ct), ls, lb, k.astype(ct),
                        None if b is None else b.astype(ct), eps)


class _FusedLnFcGelu(nn.Module):
    """LN + c_fc + QuickGELU via ops/fc1_act.dense_act_ln (same param tree)."""

    features: int
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: Array, ln) -> Array:
        from distillclip_tpu.ops.fc1_act import dense_act_ln

        k = self.param("kernel", self.kernel_init or nn.initializers.lecun_normal(),
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        ct = jnp.promote_types(x.dtype, k.dtype)
        ls, lb, eps = ln
        return dense_act_ln(x.astype(ct), ls, lb, k.astype(ct), b.astype(ct),
                            "quick_gelu", eps)


class ClipMlp(nn.Module):
    """CLIP residual-block MLP: Linear(d,4d) -> QuickGELU -> Linear(4d,d).

    Reference: _common.py:104-108 (c_fc / gelu / c_proj).
    """

    width: int
    expansion: int = 4
    # CLIP init scheme stds (reference image_encoder.py:36-48 /
    # text_encoder.py:94-106); None -> lecun_normal default
    fc_std: Optional[float] = None
    proj_std: Optional[float] = None

    @nn.compact
    def __call__(self, x: Array, ln=None) -> Array:
        fc_init = nn.initializers.normal(self.fc_std) if self.fc_std else None
        pj_init = nn.initializers.normal(self.proj_std) if self.proj_std else None
        if ln is not None:
            # ln_2 folded into the c_fc kernel (quick_gelu in-kernel); the
            # no-grad primal (frozen teachers) skips the (u, e) residual
            # writes entirely (ops/fc1_act._fc1_ln_h_kernel)
            h = _FusedLnFcGelu(self.width * self.expansion,
                               kernel_init=fc_init, name="c_fc")(x, ln)
        else:
            h = Dense(self.width * self.expansion, kernel_init=fc_init, name="c_fc")(x)
            h = quick_gelu(h)
        return Dense(self.width, kernel_init=pj_init, name="c_proj")(h)


class InstrumentedAttention(nn.Module):
    """CLIP-style fused-QKV multi-head attention with optional taps.

    Re-design of reference MultiheadAttention (_common.py:28-95): the fused
    in-projection and per-tap branches are identical in math, but taps are
    gated by *static* ControlFlags so disabled branches never reach XLA.

    Hot path: when no instrumentation is requested and dropout is inactive,
    attention runs through the fused Pallas kernel
    (distillclip_tpu/ops/flash_attention.py) — scores/probs never touch HBM.
    The instrumented path materializes them (they ARE the product then).

    The additive attention mask (causal for text) uses a large negative
    finite constant instead of -inf: it behaves identically under softmax and
    avoids inf-arithmetic NaNs in bf16.  The downstream "-inf -> 0" score
    cleanup of the reference (image_encoder.py:61-63) becomes a no-op mask we
    replicate in the encoders for parity.
    """

    width: int
    heads: int
    drop_prob: float = 0.0
    use_flash: bool = True
    # CLIP init scheme stds (reference image_encoder.py:36-48: in_proj
    # weight AND bias ~ N(0, attn_std), out_proj weight ~ N(0, proj_std));
    # None -> lecun_normal default
    attn_std: Optional[float] = None
    proj_std: Optional[float] = None

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
        ln=None,
    ) -> AttentionOutput:
        # 2D rows mode: x is [B*seq, C] (tower-level flattening keeps XLA
        # layouts row-major around the kernels; caller guarantees no taps)
        rows_in = x.ndim == 2
        if rows_in:
            assert seq is not None, "seq required for 2D rows inputs"
            N = seq
            B = x.shape[0] // seq
        else:
            B, N, _ = x.shape
        head_dim = self.width // self.heads
        if self.width % self.heads != 0:
            raise ValueError(f"width {self.width} not divisible by heads {self.heads}")

        # Fused in-projection: one [D, 3D] matmul keeps the MXU busy.
        in_init = nn.initializers.normal(self.attn_std) if self.attn_std else None
        if ln is not None:
            # ln_1 folded into the in-projection kernel (dense_ln)
            qkv = _FusedLnDense(3 * self.width, kernel_init=in_init,
                                bias_init=in_init, name="in_proj")(x, ln)
        else:
            qkv = Dense(3 * self.width, kernel_init=in_init, bias_init=in_init,
                        name="in_proj")(x)

        from distillclip_tpu.ops.flash_attention import flash_enabled

        dropout_active = self.drop_prob > 0.0 and not deterministic
        flash_ok = (
            self.use_flash
            and flash_enabled()
            and not flags.attn_tap()
            and not dropout_active
            and mask is None
            and N <= 256
        )

        if flash_ok and (N % 16 == 0 or rows_in):
            # rows-layout kernel: in rows mode the FUSED qkv projection
            # output feeds the kernel directly (lane-sliced in VMEM) — no
            # transposes, no lane padding, no q/k/v slice materializations.
            # Unaligned N (true-N rows mode) pads inside the kernel entry.
            from distillclip_tpu.ops.flash_attention import (
                flash_attention_rows,
                flash_attention_rows_qkv,
            )

            if rows_in:
                ctx = flash_attention_rows_qkv(
                    qkv, heads=self.heads, seq=N, causal=causal,
                    kv_len=kv_len,
                )
            else:
                qs = qkv[..., : self.width]
                ks = qkv[..., self.width : 2 * self.width]
                vs = qkv[..., 2 * self.width :]
                ctx = flash_attention_rows(
                    qs, ks, vs, heads=self.heads, causal=causal, kv_len=kv_len,
                )
            out = Dense(self.width, kernel_init=nn.initializers.normal(self.proj_std) if self.proj_std else None, name="out_proj")(ctx.astype(x.dtype))
            return AttentionOutput(hidden=out)

        if rows_in:
            qkv = qkv.reshape(B, N, 3 * self.width)
        qkv = qkv.reshape(B, N, 3, self.heads, head_dim)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)  # [B, H, N, d]
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        if flash_ok:
            from distillclip_tpu.ops.flash_attention import flash_attention

            ctx4 = flash_attention(q, k, v, causal=causal, kv_len=kv_len)
            ctx = ctx4.transpose(0, 2, 1, 3).reshape(B, N, self.width).astype(x.dtype)
            out = Dense(self.width, kernel_init=nn.initializers.normal(self.proj_std) if self.proj_std else None, name="out_proj")(ctx)
            return AttentionOutput(hidden=out)

        scale = 1.0 / jnp.sqrt(head_dim).astype(jnp.float32)

        # score/prob buffers: fp32 when instrumentation needs them (they are
        # the loss inputs) or when running in fp32; otherwise the compute
        # dtype — fp32 [B,H,N,N] pipelines dominate HBM traffic at CLIP
        # sequence lengths (measured: teacher text tower 8.4GB -> ~4GB)
        buf_dtype = (
            jnp.float32 if (x.dtype == jnp.float32 or flags.attn_tap()) else x.dtype
        )

        value_map = None
        if flags.need_value_map:
            # softmax(V V^T / sqrt(d)) over keys (_common.py:68-71)
            vm = jnp.einsum("bhnd,bhmd->bhnm", v, v, preferred_element_type=jnp.float32)
            vm = vm * scale
            value_map = jax.nn.softmax(vm, axis=-1)

        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=buf_dtype
        )
        scores = scores * scale.astype(buf_dtype)
        if causal and mask is None:
            from distillclip_tpu.models.transformer import causal_mask

            mask = causal_mask(N)
        if mask is not None:
            scores = scores + mask.astype(scores.dtype)
        if kv_len is not None and kv_len < N:
            col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
            scores = scores + jnp.where(col < kv_len, 0.0, -1e9)[None, None].astype(scores.dtype)

        probs = jax.nn.softmax(scores, axis=-1)
        attn = probs
        if dropout_active:
            attn = nn.Dropout(rate=self.drop_prob, deterministic=False)(attn)

        ctx = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, self.width).astype(x.dtype)
        if rows_in:
            ctx = ctx.reshape(B * N, self.width)
        out = Dense(self.width, kernel_init=nn.initializers.normal(self.proj_std) if self.proj_std else None, name="out_proj")(ctx)

        return AttentionOutput(
            hidden=out,
            attention_scores=scores if flags.need_attn_score else None,
            attention_probs=probs if flags.need_attn_prob else None,
            value_map=value_map,
        )
