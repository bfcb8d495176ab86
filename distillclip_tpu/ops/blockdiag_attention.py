"""Block-diagonal plain attention — hc-fold (not H-fold) MAC inflation.

Plain (no cross-head mix) non-causal attention for towers whose head dim
divides the 128-lane tile.  The per-head score/output/grad contractions are
true K=d dots, but issuing them per head starves the MXU (the factored
transform kernel measured exactly that, BENCH_NOTES round 3).  This kernel
packs hc = 128 // d heads per dot instead: the K/N dims stay at one full
lane tile and the FLOP inflation is hc-fold, not H-fold.

Per head-chunk c (lane slice of the fused qkv operand):

* scores  S[:, (g,j)] = dot(q_c [Np,128], (BMASK * repeat(k_c, hc)) [hc*Np,128])
  where BMASK[(g,j),(g',d')] = (g == g') zeroes the cross-head terms — every
  output column (g,j) is the TRUE per-head q_g . k_g[j] contraction;
* block softmax (chunk-level row max + per-head-block denominators via
  indicator dots, exactly the colcat scheme in transform_attention.py);
* output  o_c = dot(P[:, chunk], BMASK * repeat(v_c, hc)) — natural layout.

vs routing plain attention through the colcat transform kernel with
identity mixes (the round-3 default for heads >= 12), the MXU row-cycles
drop (H/hc)-fold — 6x for the 12-layer live image teacher (H=12, d=64,
hc=2) that dominates the joint stage's attention time — and the per-sample
packing stores shrink from one [H*Np, HD] repeat to hc-row chunk repeats.
The backward reuses the forward's saved bf16 probs (save-P, as the
transform kernel does) and emits block-diag dq/dk/dv dots of the same
shape; dk/dv come out of full [hc*Np, 128] cross dots whose off-diagonal
head blocks are discarded by hc masked row-block adds (VPU).

Reference behavior: plain MHA per weight_share_model.py:88-113 /
model.py (CLIP towers) — softmax(q k^T / sqrt(d)) v per head, no mixes.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def blockdiag_supported(heads: int, d: int, causal: bool) -> bool:
    """hc = 128//d heads per dot; need >= 2 packed heads for a saving.

    Causal IS supported: the mask is one extra additive bias in the
    forward and the backward needs nothing (masked probs are exactly 0,
    so dS/dv contributions vanish through the saved-P products)."""
    del causal
    if d <= 0 or 128 % d != 0:
        return False
    hc = 128 // d
    return hc >= 2 and heads % hc == 0 and heads >= hc


def _chunk_consts(hc: int, np_len: int, d: int, n: int, dtype,
                  causal: bool = False):
    """Static per-chunk constants (identical for every chunk).

    BMASK [hc*Np, 128] head-block indicator; kv pad bias [1, hc*Np]
    ([Np, hc*Np] when causal — j > i masked per head block);
    Dsm [hc*Np, hc] / Drow [hc, hc*Np] per-head-block one-hots for the
    softmax denominators (built as [X,1]x[1,Y] iota compares — full 2D
    iota pairs OOM the scoped-VMEM budget, see transform_attention.py).
    """
    CH = hc * np_len
    rg = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 0) // np_len
    cg = jax.lax.broadcasted_iota(jnp.int32, (CH, 128), 1) // d
    bmask = (rg == cg).astype(dtype)
    jcol = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1) % np_len
    kv_bias = jnp.where(jcol < n, 0.0, NEG_INF).astype(jnp.float32)
    if causal:
        # row index IS the query position within the sequence (each grid
        # sample's rows start at its own lo offset)
        ci = jax.lax.broadcasted_iota(jnp.int32, (np_len, CH), 0)
        cj = jax.lax.broadcasted_iota(jnp.int32, (np_len, CH), 1) % np_len
        kv_bias = kv_bias + jnp.where(cj <= ci, 0.0, NEG_INF).astype(
            jnp.float32)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (CH, hc), 0) // np_len
    c1 = jax.lax.broadcasted_iota(jnp.int32, (CH, hc), 1)
    dsm = (r1 == c1).astype(jnp.bfloat16)          # [(g,j), g'] for e-sums
    drow = (r1 == c1).astype(jnp.float32)          # f32 twin: expansion dots
    # contract dim 1 with dim 1 (denom [Np,hc] x drow [CH,hc] -> [Np,CH])
    # instead of materializing a transpose (Mosaic in-kernel transposes are
    # not generally supported; see transform_attention.py's Drow usage)
    lmasks = [
        (jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) // d == g
         ).astype(jnp.float32)
        for g in range(hc)
    ]
    return bmask, kv_bias, dsm, drow, lmasks


def _bd_fwd_kernel(qkv_ref, o_ref, p_ref=None, *, scale, gb, h, np_len, n, d,
                   causal=False):
    HD = h * d
    hc = 128 // d
    CH = hc * np_len
    bmask, kv_bias, dsm, drow, _ = _chunk_consts(hc, np_len, d, n,
                                                 qkv_ref.dtype, causal)
    for s in range(gb):
        lo = s * np_len
        for c in range(h // hc):
            cl = c * 128
            q_c = qkv_ref[lo:lo + np_len, cl:cl + 128]
            kx = pltpu.repeat(qkv_ref[lo:lo + np_len, HD + cl:HD + cl + 128],
                              hc, 0)
            sm = jax.lax.dot_general(
                q_c, bmask * kx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + kv_bias                       # [Np, CH]
            m = jnp.max(sm, axis=-1, keepdims=True)   # chunk-level row max
            e = jnp.exp(sm - m)
            denom = jax.lax.dot_general(
                e.astype(jnp.bfloat16), dsm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, hc]
            denom_full = jax.lax.dot_general(
                denom, drow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, CH]
            pb = (e / jnp.maximum(denom_full, 1e-30)).astype(jnp.bfloat16)
            if p_ref is not None:
                p_ref[lo:lo + np_len, c * CH:(c + 1) * CH] = pb
            vx = pltpu.repeat(
                qkv_ref[lo:lo + np_len, 2 * HD + cl:2 * HD + cl + 128], hc, 0)
            o = jax.lax.dot_general(
                pb, bmask * vx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, 128]
            o_ref[lo:lo + np_len, cl:cl + 128] = o.astype(o_ref.dtype)


def _bd_bwd_kernel(qkv_ref, do_ref, p_ref, dqkv_ref,
                   *, scale, gb, h, np_len, n, d):
    HD = h * d
    hc = 128 // d
    CH = hc * np_len
    bmask, _, dsm, drow, lmasks = _chunk_consts(hc, np_len, d, n,
                                                qkv_ref.dtype)

    def diag_blocks(t32):
        # [CH, 128] cross dot -> [Np, 128]: keep row-block g's lane-block g
        acc = t32[0:np_len, :] * lmasks[0]
        for g in range(1, hc):
            acc = acc + t32[g * np_len:(g + 1) * np_len, :] * lmasks[g]
        return acc

    for s in range(gb):
        lo = s * np_len
        for c in range(h // hc):
            cl = c * 128
            pb = p_ref[lo:lo + np_len, c * CH:(c + 1) * CH]
            do_c = do_ref[lo:lo + np_len, cl:cl + 128]
            vx = pltpu.repeat(
                qkv_ref[lo:lo + np_len, 2 * HD + cl:2 * HD + cl + 128], hc, 0)
            dP = jax.lax.dot_general(
                do_c, bmask * vx, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, CH]
            t = jax.lax.dot_general(
                pb, do_c, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [CH, 128]
            dqkv_ref[lo:lo + np_len, 2 * HD + cl:2 * HD + cl + 128] = (
                diag_blocks(t).astype(dqkv_ref.dtype))
            pdp = (pb.astype(jnp.float32) * dP).astype(jnp.bfloat16)
            tsum = jax.lax.dot_general(
                pdp, dsm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, hc]
            tfull = jax.lax.dot_general(
                tsum, drow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, CH]
            dS = (pb.astype(jnp.float32) * scale * (dP - tfull)
                  ).astype(jnp.bfloat16)
            kx = pltpu.repeat(qkv_ref[lo:lo + np_len, HD + cl:HD + cl + 128],
                              hc, 0)
            dq = jax.lax.dot_general(
                dS, bmask * kx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [Np, 128]
            dqkv_ref[lo:lo + np_len, cl:cl + 128] = dq.astype(dqkv_ref.dtype)
            t2 = jax.lax.dot_general(
                dS, qkv_ref[lo:lo + np_len, cl:cl + 128],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # [CH, 128]
            dqkv_ref[lo:lo + np_len, HD + cl:HD + cl + 128] = (
                diag_blocks(t2).astype(dqkv_ref.dtype))


def _bd_fwd_call(qkv2, scale, gb, np_len, h, d, n, causal, save_p):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((rows_blk, h * np_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    body = functools.partial(_bd_fwd_kernel, scale=scale, gb=gb, h=h,
                             np_len=np_len, n=n, d=d, causal=causal)
    if save_p:
        kern = lambda q, o, p: body(q, o, p)
        out_specs = (blk, p_blk)
        out_shape = (
            jax.ShapeDtypeStruct((rows_total, HD), qkv2.dtype),
            jax.ShapeDtypeStruct((rows_total, h * np_len), jnp.bfloat16),
        )
    else:
        kern = lambda q, o: body(q, o, None)
        out_specs = blk
        out_shape = jax.ShapeDtypeStruct((rows_total, HD), qkv2.dtype)
    return pl.pallas_call(
        kern,
        grid=(rows_total // rows_blk,),
        in_specs=[blk3],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(qkv2)


def _bd_bwd_call(qkv2, do2, p2, scale, gb, np_len, h, d, n):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((rows_blk, h * np_len), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bd_bwd_kernel, scale=scale, gb=gb, h=h,
                          np_len=np_len, n=n, d=d),
        grid=(rows_total // rows_blk,),
        in_specs=[blk3, blk, p_blk],
        out_specs=blk3,
        out_shape=jax.ShapeDtypeStruct((rows_total, HD3), qkv2.dtype),
        interpret=_interpret(),
    )(qkv2, do2, p2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _flash_bd(qkv2, scale, gb, np_len, h, d, n, causal):
    # primal without grad: no P residual is written at all
    return _bd_fwd_call(qkv2, scale, gb, np_len, h, d, n, causal, save_p=False)


def _flash_bd_fwd(qkv2, scale, gb, np_len, h, d, n, causal):
    o, p = _bd_fwd_call(qkv2, scale, gb, np_len, h, d, n, causal, save_p=True)
    return o, (qkv2, p)


def _flash_bd_bwd(scale, gb, np_len, h, d, n, causal, res, do):
    # masked probs are exactly 0 in the saved P, so the backward needs no
    # causal/kv mask of its own (dS, dv contributions vanish with P)
    del causal
    qkv2, p = res
    return (_bd_bwd_call(qkv2, do, p, scale, gb, np_len, h, d, n),)


_flash_bd.defvjp(_flash_bd_fwd, _flash_bd_bwd)


def _pick_gb(b: int, np_len: int, hd: int) -> int:
    """Samples per program: bound the block DMA footprint (~6 row buffers)."""
    for cand in (16, 8, 4, 2, 1):
        if b % cand == 0 and cand * np_len * hd * 2 * 6 <= 8 * 1024 * 1024:
            return cand
    return 1


def blockdiag_attention_rows_qkv(
    qkvf: Array,
    *,
    heads: int,
    seq: int,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> Array:
    """Plain (optionally causal) attention on the fused rows-qkv operand.

    Same contract as flash_attention_rows_qkv (qkvf [B*seq, 3*H*d], seq a
    16-multiple handled by the caller's pad boundary); dispatch there
    decides when this formulation applies (blockdiag_supported).
    """
    rows_total, HD3 = qkvf.shape
    HD = HD3 // 3
    d = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    valid = kv_len if kv_len is not None else seq

    def call(qkv):
        gb = _pick_gb(qkv.shape[0] // seq, seq, HD)
        return _flash_bd(qkv, float(scale), gb, seq, heads, d, valid,
                         bool(causal))

    from distillclip_tpu.ops._shard import shard_rows_call

    return shard_rows_call(call, (qkvf,), (), rows_total // seq)
