"""Fused attention kernels (Pallas/TPU) for short CLIP sequences.

Why not textbook flash attention: CLIP sequences are tiny (50 vision /
77 text tokens) so the ENTIRE sequence fits in VMEM — no online-softmax
streaming is needed.  The win on TPU is pure HBM traffic: the XLA path
materializes [B, H, N, N] scores (lane-padded 50->128, fp32) several times
per layer, which measures ~570 MB/layer at B=128 and saturates HBM
(~860 GB/s observed).  These kernels keep scores/probs entirely in VMEM:
per layer only q,k,v in and out out touch HBM.

Two forward kernels:

* ``_attn_kernel``          — per-(batch*head) grid; optional causal mask.
* ``_attn_transform_kernel`` — per-batch grid with ALL heads resident, for
  the weight-share student's cross-head 1x1 transforms (reference
  weight_share_model.py:114-121: ``conv_l`` on logits pre-softmax,
  ``conv_w`` on probs post-softmax).  Head mixing makes per-head streaming
  impossible; with N<=128 the whole [H, N, N] block fits in VMEM anyway.

Backward passes are custom VJPs with Pallas kernels of the same shape
(recompute scores in-VMEM from saved q,k,v + per-row logsumexp).

Reference baseline: the reference relies on torch spda-style unfused
attention (_common.py:51-95, weight_share_model.py:88-140); its only
native-kernel hook is the optional iRPE CUDA gather (_irpe.py:8-11).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


def _interpret() -> bool:
    """Interpret-mode on non-TPU backends so kernels run (and are tested)
    everywhere; compiled Mosaic on real TPU."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _causal_bias(n: int, dtype=jnp.float32) -> Array:
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return jnp.where(col > row, jnp.float32(NEG_INF), 0.0).astype(dtype)


# ---------------------------------------------------------------------------
# plain per-(b,h) kernel
# ---------------------------------------------------------------------------


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal):
    q = q_ref[0].astype(jnp.float32)  # [N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [N, N]
    if causal:
        s = s + _causal_bias(s.shape[0])
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)
    lse_ref[0] = (m[:, 0] + jnp.log(denom[:, 0]))[None, :]


def _attn_bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale, causal):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0][0]  # [N]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if causal:
        s = s + _causal_bias(s.shape[0])
    p = jnp.exp(s - lse[:, None])  # [N, N]

    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # p^T @ do
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # do @ v^T
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # [N,1]
    ds = p * (dp - delta) * scale
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # ds^T @ q
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _plain_fwd(q, k, v, scale, causal):
    BH, N, D = q.shape
    grid = (BH,)
    blk = lambda: pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = (
        jax.ShapeDtypeStruct((BH, N, D), q.dtype),
        jax.ShapeDtypeStruct((BH, 1, N), jnp.float32),
    )
    o, lse = pl.pallas_call(
        functools.partial(_attn_fwd_kernel, scale=scale, causal=causal),
        grid=grid,
        in_specs=[blk(), blk(), blk()],
        out_specs=(
            blk(),
            pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        interpret=_interpret(),
    )(q, k, v)
    return o, lse


def _plain_bwd(q, k, v, o, lse, do, scale, causal):
    BH, N, D = q.shape
    blk = lambda: pl.BlockSpec((1, N, D), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((1, 1, N), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out_shape = tuple(jax.ShapeDtypeStruct((BH, N, D), q.dtype) for _ in range(3))
    return pl.pallas_call(
        functools.partial(_attn_bwd_kernel, scale=scale, causal=causal),
        grid=(BH,),
        in_specs=[blk(), blk(), blk(), blk(), lse_blk, blk()],
        out_specs=(blk(), blk(), blk()),
        out_shape=out_shape,
        interpret=_interpret(),
    )(q, k, v, o, lse, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_bh(q, k, v, scale, causal):
    o, _ = _plain_fwd(q, k, v, scale, causal)
    return o


def _flash_bh_fwd(q, k, v, scale, causal):
    o, lse = _plain_fwd(q, k, v, scale, causal)
    return o, (q, k, v, o, lse)


def _flash_bh_bwd(scale, causal, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _plain_bwd(q, k, v, o, lse, do, scale, causal)
    return dq, dk, dv


_flash_bh.defvjp(_flash_bh_fwd, _flash_bh_bwd)


# ---------------------------------------------------------------------------
# per-batch kernel with cross-head transforms (weight-share student)
# ---------------------------------------------------------------------------


def _attn_tf_fwd_kernel(q_ref, k_ref, v_ref, wl_ref, ww_ref, o_ref, *, scale, causal):
    H, N, D = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    q = q_ref[0].astype(jnp.float32)  # [H, N, d]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # [H, N, N]
    # pre-softmax head mix: s'[h] = sum_g Wl[h,g] s[g]  (conv_l, :114-115).
    # Mosaic cannot reshape [H,N,N]->[H,N*N]; contract the head axis with
    # dot_general instead (lhs [H,H] x rhs [H,N,N] over rhs dim 0).
    wl = wl_ref[...].astype(jnp.float32)  # [H, H]
    s2 = jax.lax.dot_general(
        wl, s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [H, N, N]
    if causal:
        s2 = s2 + _causal_bias(N)[None]
    p = jax.nn.softmax(s2, axis=-1)
    # post-softmax head mix (conv_w, :120-121)
    ww = ww_ref[...].astype(jnp.float32)
    p2 = jax.lax.dot_general(
        ww, p, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(v.dtype)
    o = jax.lax.dot_general(
        p2, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _tf_fwd(q, k, v, wl, ww, scale, causal):
    B, H, N, D = q.shape
    blk = lambda: pl.BlockSpec((1, H, N, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_attn_tf_fwd_kernel, scale=scale, causal=causal),
        grid=(B,),
        in_specs=[blk(), blk(), blk(), w_blk, w_blk],
        out_specs=blk(),
        out_shape=jax.ShapeDtypeStruct((B, H, N, D), q.dtype),
        interpret=_interpret(),
    )(q, k, v, wl, ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _flash_tf(q, k, v, wl, ww, scale, causal):
    return _tf_fwd(q, k, v, wl, ww, scale, causal)


def _flash_tf_fwd(q, k, v, wl, ww, scale, causal):
    o = _tf_fwd(q, k, v, wl, ww, scale, causal)
    return o, (q, k, v, wl, ww)


def _flash_tf_bwd(scale, causal, res, do):
    """XLA recompute backward for the transform variant.

    The double head-mix entangles heads; a hand-rolled Pallas backward is a
    later optimization — this recompute path already avoids the fp32 HBM
    score round-trips of the naive forward+backward pair since the forward
    never stored them.
    """
    q, k, v, wl, ww = res

    def fwd(q, k, v, wl, ww):
        f32 = jnp.float32
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(f32), k.astype(f32)) * scale
        s = jnp.einsum("hg,bgnm->bhnm", wl.astype(f32), s)
        if causal:
            s = s + _causal_bias(s.shape[-1])[None, None]
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.einsum("hg,bgnm->bhnm", ww.astype(f32), p)
        return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(q.dtype)

    _, vjp = jax.vjp(fwd, q, k, v, wl, ww)
    return vjp(do)


_flash_tf.defvjp(_flash_tf_fwd, _flash_tf_bwd)


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    *,
    scale: Optional[float] = None,
    causal: bool = False,
    head_transform: Optional[Tuple[Array, Array]] = None,
) -> Array:
    """Fused attention for [B, H, N, d] inputs (N <= 256).

    ``head_transform=(Wl, Ww)``: apply [H, H] mixes to logits (pre-softmax)
    and probs (post-softmax) — the weight-share student's conv_l/conv_w.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if N > 256:
        raise ValueError(f"short-sequence fused attention requires N<=256, got {N}")
    if head_transform is not None:
        wl, ww = head_transform
        return _flash_tf(q, k, v, wl, ww, float(scale), bool(causal))
    qf = q.reshape(B * H, N, D)
    kf = k.reshape(B * H, N, D)
    vf = v.reshape(B * H, N, D)
    return _flash_bh(qf, kf, vf, float(scale), bool(causal)).reshape(B, H, N, D)


def reference_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None,
    causal: bool = False, head_transform=None,
) -> Array:
    """Unfused XLA attention with identical math (for testing/fallback)."""
    B, H, N, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * scale
    if head_transform is not None:
        s = jnp.einsum("hg,bgnm->bhnm", head_transform[0].astype(s.dtype), s)
    if causal:
        s = s + _causal_bias(N)[None, None]
    p = jax.nn.softmax(s, axis=-1)
    if head_transform is not None:
        p = jnp.einsum("hg,bgnm->bhnm", head_transform[1].astype(p.dtype), p)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(q.dtype)
