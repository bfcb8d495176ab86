"""CLIP's ModifiedResNet teacher tower (RN50-class checkpoints).

TPU-native equivalent of reference model/component/resnet_encoder.py:
3-conv stem with avgpool, anti-aliased strided bottlenecks (avgpool before
stride-2 convs), QKV AttentionPool2d head.

Design: the RN teacher is ALWAYS frozen (reference distil_model.py:59-60),
so it is implemented as a pure function over a weight pytree with a thin
``apply``-compatible adapter — no flax module machinery, BatchNorm runs in
inference mode with the checkpoint's running statistics.  NHWC layout.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from distillclip_tpu.models.outputs import ControlFlags, VisionOutput

Array = jax.Array


def _conv(x: Array, kernel: Array, stride: int = 1, padding: int = 0) -> Array:
    """NHWC conv with HWIO kernel."""
    return jax.lax.conv_general_dilated(
        x,
        kernel.astype(x.dtype),
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x: Array, p: Dict[str, Array], eps: float = 1e-5) -> Array:
    """Inference-mode BatchNorm folded to scale+bias."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = p["scale"].astype(jnp.float32) * inv
    bias = p["bias"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _avgpool(x: Array, k: int) -> Array:
    if k <= 1:
        return x
    return nn.avg_pool(x, (k, k), strides=(k, k))


def _bottleneck(x: Array, p: Dict[str, Any], stride: int) -> Array:
    """Anti-aliased bottleneck (resnet_encoder.py:10-53)."""
    out = jax.nn.relu(_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(_bn(_conv(out, p["conv2"], padding=1), p["bn2"]))
    out = _avgpool(out, stride)
    out = _bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = _avgpool(x, stride)
        identity = _bn(_conv(identity, p["downsample"]["conv"]), p["downsample"]["bn"])
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _attnpool(x: Array, p: Dict[str, Any], heads: int) -> Array:
    """QKV attention pooling (resnet_encoder.py:56-90): mean token prepended
    as the query, separate q/k/v projections, output token 0."""
    B, H, W, C = x.shape
    tokens = x.reshape(B, H * W, C)
    tokens = jnp.concatenate([tokens.mean(axis=1, keepdims=True), tokens], axis=1)
    tokens = tokens + p["positional_embedding"].astype(tokens.dtype)[None]

    def proj(name, t):
        w = p[f"{name}_proj"]
        return t @ w["kernel"].astype(t.dtype) + w["bias"].astype(t.dtype)

    q = proj("q", tokens[:, :1])  # only the mean token's output is used
    k = proj("k", tokens)
    v = proj("v", tokens)
    N = tokens.shape[1]
    hd = C // heads
    q = q.reshape(B, 1, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(attn / jnp.sqrt(float(hd)), axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    out = out.transpose(0, 2, 1, 3).reshape(B, 1, C).astype(tokens.dtype)
    cp = p["c_proj"]
    out = out @ cp["kernel"].astype(out.dtype) + cp["bias"].astype(out.dtype)
    return out[:, 0]


@dataclasses.dataclass(frozen=True)
class ModifiedResNet:
    """Frozen RN tower with a flax-like ``apply(variables, images, ...)``."""

    layers: Sequence[int]
    output_dim: int
    heads: int
    input_resolution: int = 224
    width: int = 64

    def apply(
        self,
        variables: Dict[str, Any],
        images: Array,
        flags: ControlFlags = None,
        deterministic: bool = True,
        **_,
    ) -> VisionOutput:
        p = variables["params"]
        x = images
        for i in (1, 2, 3):  # stem (resnet_encoder.py:136-140)
            x = _conv(x, p[f"conv{i}"], stride=2 if i == 1 else 1, padding=1)
            x = _bn(x, p[f"bn{i}"])
            x = jax.nn.relu(x)
        x = _avgpool(x, 2)
        for stage, blocks in enumerate(self.layers, start=1):
            for b in range(blocks):
                stride = 2 if (stage > 1 and b == 0) else 1
                x = _bottleneck(x, p[f"layer{stage}"][b], stride)
        rep = _attnpool(x, p["attnpool"], self.heads)
        return VisionOutput(last_representation=rep, last_layer_output=rep[:, None, :])

    def init(self, rng, images, flags=None, **_):
        raise NotImplementedError(
            "ModifiedResNet is load-only: weights come from a CLIP checkpoint "
            "(map_resnet_weights)"
        )


def map_resnet_weights(sd: Dict[str, np.ndarray], layers: Sequence[int]) -> Dict[str, Any]:
    """'visual.*' RN torch keys -> our weight pytree.

    Blocks within a stage are stored as a list (a pytree node) since the
    whole teacher is a constant input to the jitted step.
    """

    def conv(key):
        return sd[key].transpose(2, 3, 1, 0)  # OIHW -> HWIO

    def bn(prefix):
        return {
            "scale": sd[f"{prefix}.weight"],
            "bias": sd[f"{prefix}.bias"],
            "mean": sd[f"{prefix}.running_mean"],
            "var": sd[f"{prefix}.running_var"],
        }

    def lin(prefix):
        return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}

    tree: Dict[str, Any] = {}
    for i in (1, 2, 3):
        tree[f"conv{i}"] = conv(f"visual.conv{i}.weight")
        tree[f"bn{i}"] = bn(f"visual.bn{i}")
    for stage, blocks in enumerate(layers, start=1):
        stage_list = []
        for b in range(blocks):
            pre = f"visual.layer{stage}.{b}"
            blk = {
                "conv1": conv(f"{pre}.conv1.weight"),
                "bn1": bn(f"{pre}.bn1"),
                "conv2": conv(f"{pre}.conv2.weight"),
                "bn2": bn(f"{pre}.bn2"),
                "conv3": conv(f"{pre}.conv3.weight"),
                "bn3": bn(f"{pre}.bn3"),
            }
            if f"{pre}.downsample.0.weight" in sd:
                blk["downsample"] = {
                    "conv": conv(f"{pre}.downsample.0.weight"),
                    "bn": bn(f"{pre}.downsample.1"),
                }
            stage_list.append(blk)
        tree[f"layer{stage}"] = stage_list
    tree["attnpool"] = {
        "positional_embedding": sd["visual.attnpool.positional_embedding"],
        "q_proj": lin("visual.attnpool.q_proj"),
        "k_proj": lin("visual.attnpool.k_proj"),
        "v_proj": lin("visual.attnpool.v_proj"),
        "c_proj": lin("visual.attnpool.c_proj"),
    }
    return tree
