"""Weight-share (repeated-block) student transformers.

TPU-native re-design of reference model/component/weight_share_model.py —
the paper's student: ``depth`` logical layers executed as
``depth / repeated_times`` parameter blocks, each reused ``repeated_times``
times.  Per-repeat NON-shared pieces (reference lines cited):

* norm1 / norm2 LayerNorms per repeat        (weight_share_model.py:163-164)
* 1x1 head-mixing transforms ``conv_l``/``conv_w`` applied to the attention
  matrix pre-/post-softmax when ``use_transform`` (:79-86,114-121)
* per-repeat iRPE modules (:57-77)
* per-repeat DropPath rates (:174-175)

In JAX, weight sharing is expressed naturally: the shared submodule is called
repeatedly inside the block's ``__call__`` with a *static* repeat index that
selects the per-repeat parameter instances, replacing the reference's
``_repeated_id`` attribute mutation (:199-218).  The repeat loop is unrolled
at trace time (repeated_times is 2 in every shipped config) so XLA sees a
straight-line graph it can fuse and schedule globally.

The 1x1 convs over the head axis are einsums with an [H, H] matrix — exactly
Conv2d(num_heads, num_heads, kernel_size=1, bias=False) on [B, H, N, N].
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from distillclip_tpu.models.irpe import RpeConfig, build_rpe_params, rpe_on_keys, rpe_on_queries, rpe_on_values
from distillclip_tpu.models.outputs import (
    AttentionOutput,
    ControlFlags,
    TextOutput,
    TransformerOutput,
    VisionOutput,
)
from distillclip_tpu.models.text import TokenEmbedding, eot_pool
from distillclip_tpu.models.vit import patchify

Array = jax.Array

trunc_normal_02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class StudentLayerNorm(nn.Module):
    """Plain LayerNorm with fp32 math (student blocks use torch defaults)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, raw: bool = False):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        if raw:
            # fused-consumer mode: the caller folds this LN into the next
            # kernel (dense_act_ln); params stay declared here so the
            # parameter tree / checkpoints are identical either way
            return scale, bias
        if x.ndim == 2:
            # 2D rows mode: fused Pallas LN (see models/layers.py LayerNorm)
            from distillclip_tpu.ops.layer_norm import layer_norm_rows

            return layer_norm_rows(x, scale, bias, self.epsilon)
        orig_dtype = x.dtype
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(orig_dtype)


class StudentDense(nn.Dense):
    """Dense with trunc-normal(0.02) kernel / zero bias (timm-style init,
    weight_share_model.py:308-315).

    NOTE on layouts (measured, BENCH_NOTES round 2): at unaligned sequence
    lengths (N=77/50) XLA layout assignment couples these denses to the
    attention ops and puts BATCH on the lane dim, running every dense as a
    transposed matmul at ~35% MFU.  Neither flattening the dot to 2D nor
    lane-aligning the key dim changes its choice; only the Pallas rows
    kernels (which keep attention out of XLA's layout graph) avoid it.
    """

    def __init__(self, features, use_bias=True, name=None):
        super().__init__(
            features=features,
            use_bias=use_bias,
            param_dtype=jnp.float32,
            kernel_init=trunc_normal_02,
            bias_init=nn.initializers.zeros,
            name=name,
        )


class _DenseLnProj(nn.Module):
    """LN + dense via the fused kernel; same param tree as StudentDense."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array, ln) -> Array:
        from distillclip_tpu.ops.fc1_act import dense_ln

        k = self.param("kernel", trunc_normal_02, (x.shape[-1], self.features),
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        ct = jnp.promote_types(x.dtype, k.dtype)
        ls, lb, eps = ln
        return dense_ln(x.astype(ct), ls, lb, k.astype(ct),
                        None if b is None else b.astype(ct), eps)


def drop_path(x: Array, rate: float, deterministic: bool, rng: Optional[Array]) -> Array:
    """Stochastic depth on the residual branch (per sample)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class MiniAttention(nn.Module):
    """Shared-parameter attention with per-repeat head transforms and iRPE.

    Reference: weight_share_model.py:37-151 (MiniAttention).

    Tap semantics match the reference exactly:
    * ``attention_scores`` = scaled q@k^T BEFORE rpe_k/rpe_q/conv_l (:103-105)
    * ``attention_probs``  = softmax output BEFORE conv_w (:117-119)
    """

    dim: int
    num_heads: int
    repeated_times: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_transform: bool = False
    rpe_config: Optional[RpeConfig] = None
    seq_len: Optional[int] = None  # needed only when rpe_config is set

    @nn.compact
    def __call__(
        self,
        x: Array,
        repeat_id: int,
        flags: ControlFlags,
        kv_len: Optional[int] = None,
        deterministic: bool = True,
        seq: Optional[int] = None,
        ln=None,
    ) -> AttentionOutput:
        # 2D rows mode: x is [B*seq, C] (tower-level flattening; keeps XLA
        # layouts row-major around the kernels — BENCH_NOTES round 3).
        # The caller guarantees no taps/rpe in this mode.
        rows_in = x.ndim == 2
        if rows_in:
            assert seq is not None, "seq required for 2D rows inputs"
            N = seq
            B = x.shape[0] // seq
            C = x.shape[1]
        else:
            B, N, C = x.shape
        head_dim = C // self.num_heads
        scale = self.qk_scale or head_dim ** -0.5

        if ln is not None:
            # norm1 folded into the qkv dense kernel (ops/fc1_act.dense_ln):
            # the qkv output crosses the attention custom-call boundary and
            # is materialized either way; fusing saves the standalone LN's
            # [rows, C] write + re-read.  Param tree identical ("qkv").
            qkv = _DenseLnProj(3 * C, use_bias=self.qkv_bias, name="qkv")(x, ln)
        else:
            qkv = StudentDense(3 * C, use_bias=self.qkv_bias, name="qkv")(x)

        from distillclip_tpu.ops.flash_attention import flash_enabled

        dropout_active = self.attn_drop > 0.0 and not deterministic
        flash_ok = (
            flash_enabled()
            and not flags.attn_tap()
            and not dropout_active
            and self.rpe_config is None
            and N <= 256
        )
        if flash_ok and (N % 16 == 0 or rows_in):
            # rows-layout kernels; in 2D rows mode the FUSED qkv projection
            # output feeds the kernel directly (one operand, lane-sliced in
            # VMEM) — the 3-slice variant cost 4.6 ms/step of pure copies
            # (round-3 text trace).  Unaligned N (true-N rows mode) pads
            # inside the kernel entries.
            if self.use_transform:
                from distillclip_tpu.ops.transform_attention import (
                    transform_attention_rows,
                    transform_attention_rows_qkv,
                )

                conv_l = self.param(
                    "conv_l", trunc_normal_02,
                    (self.repeated_times, self.num_heads, self.num_heads),
                    jnp.float32,
                )
                conv_w = self.param(
                    "conv_w", trunc_normal_02,
                    (self.repeated_times, self.num_heads, self.num_heads),
                    jnp.float32,
                )
                if rows_in:
                    ctx = transform_attention_rows_qkv(
                        qkv, conv_l[repeat_id], conv_w[repeat_id],
                        heads=self.num_heads, seq=N, scale=scale, kv_len=kv_len,
                    )
                else:
                    qs, ks, vs = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
                    ctx = transform_attention_rows(
                        qs, ks, vs, conv_l[repeat_id], conv_w[repeat_id],
                        heads=self.num_heads, scale=scale, kv_len=kv_len,
                    )
            else:
                from distillclip_tpu.ops.flash_attention import (
                    flash_attention_rows,
                    flash_attention_rows_qkv,
                )

                if rows_in:
                    ctx = flash_attention_rows_qkv(
                        qkv, heads=self.num_heads, seq=N, scale=scale,
                        kv_len=kv_len,
                    )
                else:
                    qs, ks, vs = qkv[..., :C], qkv[..., C : 2 * C], qkv[..., 2 * C :]
                    ctx = flash_attention_rows(
                        qs, ks, vs, heads=self.num_heads, scale=scale, kv_len=kv_len,
                    )
            out = StudentDense(C, name="proj")(ctx.astype(x.dtype))
            if self.proj_drop > 0.0 and not deterministic:
                out = nn.Dropout(rate=self.proj_drop, deterministic=False)(out)
            return AttentionOutput(hidden=out)

        if rows_in:
            # unfused fallback needs the [B, N, C] view (rare in rows mode:
            # only attn-dropout training configs reach it)
            qkv = qkv.reshape(B, N, 3 * C)
        qkv = qkv.reshape(B, N, 3, self.num_heads, head_dim)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)

        if flash_ok:
            # fused path; with use_transform the per-repeat cross-head mixes
            # are applied by the kernel/fallback (ops/flash_attention.py)
            from distillclip_tpu.ops.flash_attention import flash_attention

            transform = None
            if self.use_transform:
                conv_l = self.param(
                    "conv_l", trunc_normal_02,
                    (self.repeated_times, self.num_heads, self.num_heads), jnp.float32,
                )
                conv_w = self.param(
                    "conv_w", trunc_normal_02,
                    (self.repeated_times, self.num_heads, self.num_heads), jnp.float32,
                )
                transform = (conv_l[repeat_id], conv_w[repeat_id])
            ctx4 = flash_attention(q, k, v, scale=scale, head_transform=transform,
                                   kv_len=kv_len)
            out = ctx4.transpose(0, 2, 1, 3).reshape(B, N, C).astype(x.dtype)
            out = StudentDense(C, name="proj")(out)
            if self.proj_drop > 0.0 and not deterministic:
                out = nn.Dropout(rate=self.proj_drop, deterministic=False)(out)
            return AttentionOutput(hidden=out)

        buf_dtype = (
            jnp.float32 if (x.dtype == jnp.float32 or flags.attn_tap()) else x.dtype
        )

        value_map = None
        if flags.need_value_map:
            vm = jnp.einsum("bhnd,bhmd->bhnm", v, v, preferred_element_type=jnp.float32)
            vm = vm / math.sqrt(head_dim)
            value_map = jax.nn.softmax(vm, axis=-1)

        q = q * jnp.asarray(scale, x.dtype)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=buf_dtype)
        attention_scores = attn if flags.need_attn_score else None

        rpe = None
        if self.rpe_config is not None:
            if self.seq_len is None:
                raise ValueError("seq_len required when rpe_config is set")
            rpe = build_rpe_params(
                self, self.rpe_config, head_dim, self.num_heads, self.seq_len, self.repeated_times
            )
            attn = attn + rpe_on_keys(rpe, repeat_id, q)
            attn = attn + rpe_on_queries(rpe, repeat_id, k * scale)

        if self.use_transform:
            # per-repeat 1x1 conv over the head axis, pre-softmax (:114-115)
            conv_l = self.param(
                "conv_l", trunc_normal_02, (self.repeated_times, self.num_heads, self.num_heads),
                jnp.float32,
            )
            attn = jnp.einsum(
                "hg,bgnm->bhnm", conv_l[repeat_id].astype(attn.dtype), attn,
                preferred_element_type=buf_dtype,
            )

        n_keys = k.shape[2]
        if kv_len is not None and kv_len < n_keys:
            col = jax.lax.broadcasted_iota(jnp.int32, (N, n_keys), 1)
            attn = attn + jnp.where(col < kv_len, 0.0, -1e9)[None, None].astype(attn.dtype)

        attn = jax.nn.softmax(attn, axis=-1)
        attention_probs = attn if flags.need_attn_prob else None

        if self.use_transform:
            # post-softmax head mixing (:120-121)
            conv_w = self.param(
                "conv_w", trunc_normal_02, (self.repeated_times, self.num_heads, self.num_heads),
                jnp.float32,
            )
            attn = jnp.einsum(
                "hg,bgnm->bhnm", conv_w[repeat_id].astype(attn.dtype), attn,
                preferred_element_type=buf_dtype,
            )

        if self.attn_drop > 0.0 and not deterministic:
            attn = nn.Dropout(rate=self.attn_drop, deterministic=False)(attn)

        out = jnp.einsum(
            "bhnm,bhmd->bhnd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        if rpe is not None:
            out = out + rpe_on_values(rpe, repeat_id, attn.astype(v.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(x.dtype)
        if rows_in:
            out = out.reshape(B * N, C)
        out = StudentDense(C, name="proj")(out)
        if self.proj_drop > 0.0 and not deterministic:
            out = nn.Dropout(rate=self.proj_drop, deterministic=False)(out)

        return AttentionOutput(
            hidden=out,
            attention_scores=attention_scores,
            attention_probs=attention_probs,
            value_map=value_map,
        )


def _fc1_mode() -> str:
    """'kernel' (fused Pallas fc1+act forward) or 'xla'."""
    import os

    return os.environ.get("DISTILLCLIP_FC1", "kernel")


def _mlp_ln_fused(x) -> bool:
    """Fold norm1/norm2 into the consumer kernels (2D rows mode only).

    DISTILLCLIP_FC1_LN=0 opts out (A/B lever; the standalone fused-LN
    kernel path stays available either way).
    """
    from distillclip_tpu.models.layers import ln_fusion_active

    return ln_fusion_active(x)


class _Fc1Act(nn.Module):
    """fc1 + activation via the fused Pallas forward (ops/fc1_act.py).

    Declares the same kernel/bias params (names, shapes, init) as the
    StudentDense it replaces, so the parameter tree and checkpoints are
    identical between the kernel and XLA paths.
    """

    features: int
    act: str = "gelu_exact"
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x: Array, ln=None) -> Array:
        from distillclip_tpu.ops.fc1_act import dense_act, dense_act_ln

        k = self.param("kernel", self.kernel_init or trunc_normal_02,
                       (x.shape[-1], self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        # same dtype promotion as nn.Dense(dtype=None): params arrive bf16
        # from cast_to_compute in train steps, fp32 at init/eval
        ct = jnp.promote_types(x.dtype, k.dtype)
        if ln is not None:
            # norm2 folded into the kernel (its params pass through raw;
            # LN math is fp32 in-kernel like the standalone path)
            ls, lb, eps = ln
            return dense_act_ln(x.astype(ct), ls, lb, k.astype(ct),
                                b.astype(ct), self.act, eps)
        return dense_act(x.astype(ct), k.astype(ct), b.astype(ct), self.act)


class Mlp(nn.Module):
    """timm-style MLP: fc1 -> GELU(exact) -> drop -> fc2 -> drop."""

    in_features: int
    hidden_features: int
    drop: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True, ln=None) -> Array:
        from distillclip_tpu.ops.flash_attention import flash_enabled

        if x.ndim == 2 and flash_enabled() and _fc1_mode() == "kernel":
            # fused fc1+GELU forward kernel (2D rows mode): XLA runs this
            # dense at 45% MFU on its two [rows, 4C] residual writes
            # (ops/fc1_act.py; device trace in BENCH_NOTES round 3).
            # NOTE: NO remat instead — jax.checkpoint on the activation
            # measured SLOWER (154.5 -> 165.7 ms text step): the backward
            # erf recompute doesn't fuse; it becomes its own [rows, 4C] pass
            x = _Fc1Act(self.hidden_features, act="gelu_exact",
                        name="fc1")(x, ln=ln)
        else:
            if ln is not None:  # pragma: no cover - blocks only fuse on the kernel path
                raise ValueError("ln fusion requires the fc1 kernel path")
            x = StudentDense(self.hidden_features, name="fc1")(x)
            x = jax.nn.gelu(x, approximate=False)
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.drop, deterministic=False)(x)
        x = StudentDense(self.in_features, name="fc2")(x)
        if self.drop > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.drop, deterministic=False)(x)
        return x


class RepeatedMiniBlock(nn.Module):
    """One parameter block executed ``repeated_times`` times.

    Reference: MiniBlock + RepeatedMiniBlock (weight_share_model.py:154-223).
    Shared across repeats: attention qkv/proj, MLP.  Per-repeat: norm1/norm2,
    conv_l/conv_w (inside MiniAttention), DropPath rate, iRPE.
    """

    dim: int
    num_heads: int
    repeated_times: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_paths: Sequence[float] = (0.0,)
    use_transform: bool = False
    rpe_config: Optional[RpeConfig] = None
    seq_len: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: Array, flags: ControlFlags, kv_len: Optional[int] = None,
        deterministic: bool = True, seq: Optional[int] = None,
    ) -> TransformerOutput:
        assert len(self.drop_paths) == self.repeated_times
        # 2D rows mode (x: [B*seq, C]): LN/MLP/residuals are last-dim ops and
        # run unchanged; per-sample drop_path must be inactive (tower gates)
        attn = MiniAttention(
            dim=self.dim,
            num_heads=self.num_heads,
            repeated_times=self.repeated_times,
            qkv_bias=self.qkv_bias,
            qk_scale=self.qk_scale,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_transform=self.use_transform,
            rpe_config=self.rpe_config,
            seq_len=self.seq_len,
            name="attn",
        )
        mlp = Mlp(
            in_features=self.dim,
            hidden_features=int(self.dim * self.mlp_ratio),
            drop=self.drop,
            name="mlp",
        )
        norm1 = [
            StudentLayerNorm(name=f"norm1_{r}") for r in range(self.repeated_times)
        ]
        norm2 = [
            StudentLayerNorm(name=f"norm2_{r}") for r in range(self.repeated_times)
        ]

        scores, probs, reps = [], [], []
        value_map = None
        for r in range(self.repeated_times):
            if _mlp_ln_fused(x):
                ls1, lb1 = norm1[r](x, raw=True)
                a_out = attn(x, r, flags, kv_len=kv_len,
                             deterministic=deterministic, seq=seq,
                             ln=(ls1, lb1, norm1[r].epsilon))
            else:
                a_out = attn(norm1[r](x), r, flags, kv_len=kv_len,
                             deterministic=deterministic, seq=seq)
            dp_rng = (
                self.make_rng("droppath")
                if (not deterministic and self.drop_paths[r] > 0.0)
                else None
            )
            x = x + drop_path(a_out.hidden, self.drop_paths[r], deterministic, dp_rng)
            if _mlp_ln_fused(x):
                # norm2 folded into the fc1 kernel: saves the standalone LN
                # kernel's full [rows, C] write + re-read per repeat
                ls, lb = norm2[r](x, raw=True)
                m_out = mlp(x, deterministic=deterministic,
                            ln=(ls, lb, norm2[r].epsilon))
            else:
                m_out = mlp(norm2[r](x), deterministic=deterministic)
            dp_rng2 = (
                self.make_rng("droppath")
                if (not deterministic and self.drop_paths[r] > 0.0)
                else None
            )
            x = x + drop_path(m_out, self.drop_paths[r], deterministic, dp_rng2)
            if flags.need_rep:
                reps.append(x)
            if flags.need_attn_score:
                scores.append(a_out.attention_scores)
            if flags.need_attn_prob:
                probs.append(a_out.attention_probs)
            value_map = a_out.value_map

        stack = lambda xs: jnp.stack(xs, axis=0) if xs else None
        return TransformerOutput(
            hidden=x,
            attention_scores=stack(scores),
            attention_probs=stack(probs),
            representations=stack(reps),
            value_map=value_map,
        )


def _concat_opt(parts: list) -> Optional[Array]:
    parts = [p for p in parts if p is not None]
    return jnp.concatenate(parts, axis=0) if parts else None


class RepeatVisionTransformer(nn.Module):
    """Weight-share student ViT (weight_share_model.py:226-381).

    Final shipped config: depth 6, repeated_times 2, heads 24, embed 768,
    patch 32, qkv_bias, use_transform (config/final_config/image.yaml:5-23).

    Quirk preserved: like the reference (:336-372), ``need_layers`` is
    accepted but NOT applied — taps from every executed repeat are returned.
    """

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    out_dim: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    repeated_times: int = 1
    use_transform: bool = False
    rpe_config: Optional[RpeConfig] = None
    need_layers: Optional[Sequence[int]] = None
    remat: bool = False  # rematerialize each block in backward (less HBM)

    @nn.compact
    def __call__(
        self, images: Array, flags: ControlFlags, deterministic: bool = True
    ) -> VisionOutput:
        assert self.depth % self.repeated_times == 0
        B = images.shape[0]
        P = self.patch_size
        n_patches = (self.img_size // P) ** 2
        seq_len = n_patches + 1
        if images.shape[1] != self.img_size or images.shape[2] != self.img_size:
            raise ValueError(
                f"RepeatVisionTransformer(img_size={self.img_size}) got images "
                f"of shape {tuple(images.shape)} (expected NHWC with "
                f"H=W={self.img_size})"
            )

        # timm PatchEmbed: conv(patch, stride=patch) WITH bias -> matmul form
        patch_kernel = self.param(
            "patch_kernel", trunc_normal_02, (P * P * self.in_chans, self.embed_dim), jnp.float32
        )
        patch_bias = self.param(
            "patch_bias", nn.initializers.zeros, (self.embed_dim,), jnp.float32
        )
        x = patchify(images, P) @ patch_kernel.astype(images.dtype) + patch_bias.astype(
            images.dtype
        )

        cls_token = self.param("cls_token", trunc_normal_02, (1, 1, self.embed_dim), jnp.float32)
        pos_embed = self.param(
            "pos_embed", trunc_normal_02, (1, seq_len, self.embed_dim), jnp.float32
        )
        x = jnp.concatenate([jnp.broadcast_to(cls_token.astype(x.dtype), (B, 1, self.embed_dim)), x], axis=1)
        x = x + pos_embed.astype(x.dtype)
        embedding = x if flags.need_emb else None
        if self.drop_rate > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.drop_rate, deterministic=False)(x)

        # sequence-level padding (see models/vit.py): tile-aligned layers,
        # pad keys masked via kv_len; off when per-layer taps are requested
        # or when iRPE is active (bucket tables are length-specific)
        N0 = x.shape[1]
        from distillclip_tpu.ops.flash_attention import (
            flash_enabled, true_n_rows_enabled,
        )

        pad_ok = (not flags.attn_tap() and not flags.need_rep
                  and self.rpe_config is None and flash_enabled())
        Npad = -(-N0 // 16) * 16 if pad_ok else N0

        n_blocks = self.depth // self.repeated_times
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]

        # 2D rows mode: run every block on [B*Nrun, C] so XLA keeps row-major
        # layouts on the denses (rank-3 towers get batch-minor layouts at
        # 35-58% MFU; the same math on 2D rows runs at ~80% — BENCH_NOTES
        # round 3).  Per-sample drop_path is shape-sensitive, so only when
        # it is inactive.
        rows_mode = pad_ok and (deterministic or self.drop_path_rate == 0.0)
        # true-N rows: keep the tower at the real token count when padding
        # would add >5% rows (ViT-B/32: 50->64 = +28% on every dense); the
        # attention entries pad at the kernel boundary instead.
        true_n = (rows_mode and Npad != N0 and true_n_rows_enabled(B * N0)
                  and (Npad - N0) * 20 > N0)
        Nrun = N0 if true_n else Npad
        kv_len = N0 if (pad_ok and Nrun != N0) else None
        if Nrun != N0:
            x = jnp.pad(x, ((0, 0), (0, Nrun - N0), (0, 0)))
        if rows_mode:
            x = x.reshape(B * Nrun, self.embed_dim)

        scores, probs, reps = [], [], []
        value_map = None
        block_cls = (
            nn.remat(RepeatedMiniBlock, static_argnums=(2, 3, 4, 5))
            if self.remat else RepeatedMiniBlock
        )
        for b in range(n_blocks):
            block_out = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                repeated_times=self.repeated_times,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_paths=tuple(dpr[b * self.repeated_times : (b + 1) * self.repeated_times]),
                use_transform=self.use_transform,
                rpe_config=self.rpe_config,
                seq_len=seq_len,
                name=f"blocks_{b}",
            )(x, flags, kv_len, deterministic, Nrun if rows_mode else None)
            x = block_out.hidden
            scores.append(block_out.attention_scores)
            probs.append(block_out.attention_probs)
            reps.append(block_out.representations)
            value_map = block_out.value_map

        norm = StudentLayerNorm(name="norm")
        head = StudentDense(self.out_dim, name="head")
        if not flags.need_last_layer:
            # pool-first tail: only the cls row survives, and LN/dense are
            # per-row, so norm+head run on [B, C] instead of [B, N, C]
            # (identical pooled value; last_layer_output gets the same
            # [B, 1, D] stand-in the cached-teacher paths use)
            cls_rows = (x[::Nrun] if rows_mode else x[:, 0])
            rep = head(norm(cls_rows))
            full = rep[:, None, :]
        else:
            if rows_mode:
                x = x.reshape(B, Nrun, self.embed_dim)
            if Nrun != N0:
                x = x[:, :N0]
            x = head(norm(x))
            rep, full = x[:, 0], x

        return VisionOutput(
            last_representation=rep,
            last_layer_output=full,
            attention_scores=_concat_opt(scores),
            attention_probs=_concat_opt(probs),
            representations=_concat_opt(reps),
            value_map=value_map,
            embedding=embedding,
        )


class RepeatTextTransformer(nn.Module):
    """Weight-share student text transformer (weight_share_model.py:384-521).

    Final shipped config: depth 4, repeated_times 2, compression embedding
    (config/final_config/text.yaml:6-10).

    Quirk preserved (documented): the reference student text model applies NO
    causal mask — attention is bidirectional (forward_features :482-504 never
    builds one), unlike the CLIP teacher.  EOT pooling is argmax of token ids
    (:506).
    """

    vocab_size: int = 49408
    context_length: int = 77
    out_dim: int = 512
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    repeated_times: int = 1
    use_transform: bool = False
    compression_embedding: bool = False
    embedding_compression_dim: int = 256
    rpe_config: Optional[RpeConfig] = None
    need_layers: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(
        self, tokens: Array, flags: ControlFlags, deterministic: bool = True
    ) -> TextOutput:
        assert self.depth % self.repeated_times == 0
        pos_embed = self.param(
            "pos_embed", trunc_normal_02, (self.context_length, self.embed_dim), jnp.float32
        )
        # pos_embed's (possibly step-cast) dtype is the tower compute
        # dtype; vocab tables skip the full-table step cast and the
        # gathered rows cast here instead (see text.TokenEmbedding)
        x = TokenEmbedding(
            vocab_size=self.vocab_size,
            width=self.embed_dim,
            compression=self.compression_embedding,
            compression_dim=self.embedding_compression_dim,
            name="patch_embed",
        )(tokens, dtype=pos_embed.dtype)
        x = x + pos_embed.astype(x.dtype)
        embedding = x if flags.need_emb else None
        if self.drop_rate > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.drop_rate, deterministic=False)(x)

        # sequence-level padding; NOTE the student text model is
        # bidirectional (quirk preserved) so pad keys MUST be masked
        N0 = x.shape[1]
        from distillclip_tpu.ops.flash_attention import (
            flash_enabled, true_n_rows_enabled,
        )

        pad_ok = (not flags.attn_tap() and not flags.need_rep
                  and self.rpe_config is None and flash_enabled())
        Npad = -(-N0 // 16) * 16 if pad_ok else N0

        n_blocks = self.depth // self.repeated_times
        dpr = [self.drop_path_rate * i / max(self.depth - 1, 1) for i in range(self.depth)]

        # 2D rows mode (see RepeatVisionTransformer); true-N keeps the
        # tower at the real token count when padding adds >5% rows
        B = x.shape[0]
        rows_mode = pad_ok and (deterministic or self.drop_path_rate == 0.0)
        true_n = (rows_mode and Npad != N0 and true_n_rows_enabled(B * N0)
                  and (Npad - N0) * 20 > N0)
        Nrun = N0 if true_n else Npad
        kv_len = N0 if (pad_ok and Nrun != N0) else None
        if Nrun != N0:
            x = jnp.pad(x, ((0, 0), (0, Nrun - N0), (0, 0)))
        if rows_mode:
            x = x.reshape(B * Nrun, self.embed_dim)

        scores, probs, reps = [], [], []
        value_map = None
        for b in range(n_blocks):
            block_out = RepeatedMiniBlock(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                repeated_times=self.repeated_times,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_paths=tuple(dpr[b * self.repeated_times : (b + 1) * self.repeated_times]),
                use_transform=self.use_transform,
                rpe_config=self.rpe_config,
                seq_len=self.context_length,
                name=f"blocks_{b}",
            )(x, flags, kv_len=kv_len, deterministic=deterministic,
              seq=Nrun if rows_mode else None)
            x = block_out.hidden
            scores.append(block_out.attention_scores)
            probs.append(block_out.attention_probs)
            reps.append(block_out.representations)
            value_map = block_out.value_map

        norm = StudentLayerNorm(name="norm")
        head = StudentDense(self.out_dim, name="head")
        if not flags.need_last_layer:
            # pool-first tail: only the EOT row survives and LN/dense are
            # per-row — gather it (still 2D in rows mode), then norm+head
            # on [B, C] instead of [B, N, C]
            eot_idx = jnp.argmax(tokens, axis=-1)                    # [B]
            if rows_mode:
                rows = jnp.take(
                    x, jnp.arange(B) * Nrun + eot_idx, axis=0)       # [B, C]
            else:
                rows = eot_pool(x, tokens)
            rep = head(norm(rows))
            full = rep[:, None, :]
        else:
            if rows_mode:
                x = x.reshape(B, Nrun, self.embed_dim)
            if Nrun != N0:
                x = x[:, :N0]
            x = head(norm(x))
            rep, full = eot_pool(x, tokens), x

        return TextOutput(
            last_representation=rep,
            last_layer_output=full,
            attention_scores=_concat_opt(scores),
            attention_probs=_concat_opt(probs),
            representations=_concat_opt(reps),
            value_map=value_map,
            embedding=embedding,
        )
