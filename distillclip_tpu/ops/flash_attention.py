"""Fused attention kernels (Pallas/TPU) for short CLIP sequences.

Why not textbook flash attention: CLIP sequences are tiny (50 vision /
77 text tokens) so the ENTIRE sequence fits in VMEM — no online-softmax
streaming is needed.  The win on TPU is pure HBM traffic: the XLA path
materializes [B, H, N, N] scores (lane-padded 50->128, fp32) several times
per layer, which measures ~570 MB/layer at B=128 and saturates HBM
(~860 GB/s observed).  These kernels keep scores/probs entirely in VMEM:
per layer only q,k,v in and out out touch HBM.

Kernel architecture (v2): a per-(batch*head) grid drowns in grid-iteration
overhead and 25%-utilized MXU tiles (measured slower than XLA), so G heads
are PACKED along the sublane axis: one [G*Np, d] x [d, G*Np] matmul per
program with a block-diagonal + causal + key-padding bias generated from
iota in-register.  The off-diagonal (cross-head) blocks are masked to -1e9
before softmax, making the subsequent p @ v_packed contraction exact.  The
G-fold FLOP overspend is free — the op is bandwidth-bound by ~10x.

Two variants:

* plain           — teacher towers and students without head transforms.
* head-transform  — the weight-share student's cross-head 1x1 transforms
  (reference weight_share_model.py:114-121: ``conv_l`` on logits
  pre-softmax, ``conv_w`` on probs post-softmax).  Head mixing needs all
  heads of a sample resident; the kernel keeps [H, Np, Np] scores in VMEM
  and mixes via dot_general over the head axis.

Backward passes are custom VJPs with Pallas kernels of the same shape
(recompute scores in-VMEM from saved q,k,v + per-row logsumexp).

Reference baseline: the reference relies on torch unfused attention
(_common.py:51-95, weight_share_model.py:88-140); its only native-kernel
hook is the optional iRPE CUDA gather (_irpe.py:8-11).
"""

from __future__ import annotations

import functools
import math
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

NEG_INF = -1e9


def flash_enabled() -> bool:
    """Pallas fast path: attention kernels + tower seq padding + 2D rows
    mode + fused LN/fc1 kernels.  DISTILLCLIP_FLASH=0 opts out (XLA path).

    Default is ON since round 3: with the save-P transform backward, 2D
    rows mode (which fixes the batch-minor layout pathology of the
    surrounding denses), and the fused LN/fc1 kernels, the kernel path wins
    end-to-end at BOTH final-config shapes on v5e (BENCH_NOTES round 3):
    cached text 143.4 ms vs 193.9 XLA at B=1024; joint cached 109.9 ms vs
    115.2 XLA at B=256."""
    return os.environ.get("DISTILLCLIP_FLASH", "1") == "1"


def _interpret() -> bool:
    """Interpret-mode on non-TPU backends so kernels run (and are tested)
    everywhere; compiled Mosaic on real TPU."""
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def true_n_rows_enabled(rows: Optional[int] = None) -> bool:
    """2D rows mode at the TRUE sequence length.

    When enabled the towers keep activations at [B*N0, C] (N0 the real
    token count, e.g. 50 for ViT-B/32) instead of padding the whole tower
    to a 16-multiple; the attention entry points pad/unpad at the kernel
    boundary only.  True-N trades ~21% fewer dense/LN/MLP FLOPs (at
    ViT-B/32's 50->64 pad) for per-layer qkv-pad + context-unpad copies.

    Measured (interleaved A/B, fenced, v5e-1, BENCH_NOTES round 3): the
    trade WINS at small row counts and LOSES once the step goes
    bandwidth-bound — stage-1 image B=256 (12,800 rows) 61.6 -> 57.6 ms,
    joint B=256 92.0 -> 88.5 ms, but stage-1 image B=512 (25,600 rows)
    121.1 -> 123.7 ms.  Default is therefore ``auto``: true-N only when
    the tower's total true rows (B*N0) stay at or under
    DISTILLCLIP_TRUE_N_MAX_ROWS (default 16384, between the measured win
    and loss points).  DISTILLCLIP_TRUE_N=1/0 forces it on/off."""
    mode = os.environ.get("DISTILLCLIP_TRUE_N", "auto")
    if mode == "1":
        return True
    if mode == "auto" and rows is not None:
        max_rows = int(os.environ.get("DISTILLCLIP_TRUE_N_MAX_ROWS", "16384"))
        return rows <= max_rows
    return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pick_group(bh: int, np_len: int, max_rows: int = 512) -> int:
    """Heads packed per program: largest divisor of bh with G*Np <= max_rows."""
    best = 1
    for g in range(1, bh + 1):
        if bh % g == 0 and g * np_len <= max_rows:
            best = g
    return best


def _packed_bias(g: int, np_len: int, n: int, causal: bool) -> Array:
    """[G*Np, G*Np] additive bias: block-diagonal, key-padding, causal."""
    rows = g * np_len
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    ok = (row // np_len) == (col // np_len)
    ok = jnp.logical_and(ok, (col % np_len) < n)
    if causal:
        ok = jnp.logical_and(ok, (col % np_len) <= (row % np_len))
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


# ---------------------------------------------------------------------------
# plain packed kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal, g, np_len, n):
    q = q_ref[...]  # [G*Np, d] — keep input dtype (bf16): MXU accumulates f32
    k = k_ref[...]
    v = v_ref[...]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + _packed_bias(g, np_len, n, causal)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = (e / denom).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[...] = o.astype(o_ref.dtype)
    lse_ref[...] = (m + jnp.log(denom))  # [G*Np, 1]


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, causal, g, np_len, n):
    q = q_ref[...]
    k = k_ref[...]
    v = v_ref[...]
    o = o_ref[...].astype(jnp.float32)
    do32 = do_ref[...].astype(jnp.float32)
    do = do_ref[...]
    lse = lse_ref[...]  # [G*Np, 1]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    s = s + _packed_bias(g, np_len, n, causal)
    p = jnp.exp(s - lse)
    pb = p.astype(q.dtype)

    dv = jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    delta = jnp.sum(do32 * o, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq_ref[...] = dq.astype(dq_ref.dtype)
    dk_ref[...] = dk.astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


def _plain_fwd(qf, kf, vf, scale, causal, g, np_len, n):
    """qf/kf/vf: [BH*Np, d] packed rows."""
    rows_total, D = qf.shape
    rows_blk = g * np_len
    n_blocks = rows_total // rows_blk
    blk = pl.BlockSpec((rows_blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((rows_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal, g=g,
                          np_len=np_len, n=n),
        grid=(n_blocks,),
        in_specs=[blk, blk, blk],
        out_specs=(blk, lse_blk),
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, D), qf.dtype),
            jax.ShapeDtypeStruct((rows_total, 1), jnp.float32),
        ),
        interpret=_interpret(),
    )(qf, kf, vf)
    return o, lse


def _plain_bwd(qf, kf, vf, of, lse, dof, scale, causal, g, np_len, n):
    rows_total, D = qf.shape
    rows_blk = g * np_len
    n_blocks = rows_total // rows_blk
    blk = pl.BlockSpec((rows_blk, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((rows_blk, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, causal=causal, g=g,
                          np_len=np_len, n=n),
        grid=(n_blocks,),
        in_specs=[blk, blk, blk, blk, lse_blk, blk],
        out_specs=(blk, blk, blk),
        out_shape=tuple(jax.ShapeDtypeStruct((rows_total, D), qf.dtype) for _ in range(3)),
        interpret=_interpret(),
    )(qf, kf, vf, of, lse, dof)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_packed(qf, kf, vf, scale, causal, g, np_len, n):
    o, _ = _plain_fwd(qf, kf, vf, scale, causal, g, np_len, n)
    return o


def _flash_packed_fwd(qf, kf, vf, scale, causal, g, np_len, n):
    o, lse = _plain_fwd(qf, kf, vf, scale, causal, g, np_len, n)
    return o, (qf, kf, vf, o, lse)


def _flash_packed_bwd(scale, causal, g, np_len, n, res, do):
    qf, kf, vf, o, lse = res
    return _plain_bwd(qf, kf, vf, o, lse, do, scale, causal, g, np_len, n)


_flash_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


# ---------------------------------------------------------------------------
# v3 "rows" kernels: natural [rows, H*d] layout, heads packed in VMEM
# ---------------------------------------------------------------------------
#
# Feeding kernels in [B, H, N, d] costs two HBM taxes the math never needed:
# a materialized transpose per tensor (XLA folds transposes into dots; a
# Pallas operand must be physical) and 2x lane padding whenever d=64<128.
# These kernels consume q/k/v exactly as the fused QKV projection produces
# them — [B*Np, H*d] lane-dense rows — and do the head split/packing in
# VMEM where relayouts are ~free.  Per layer, HBM sees only 3 dense reads
# and 1 dense write.


def _head_chunk(h: int, np_len: int, max_rows: int = 768) -> int:
    """Heads per packed block, bounding the (hc*Np)^2 fp32 score matrix.

    The packed dot computes hc-fold FLOP-inflated cross-head blocks (masked
    by the bias), so hc also trades MXU-dot overhead against inflation;
    DISTILLCLIP_FLASH_HC overrides for tuning (must divide h).
    """
    import os

    env = os.environ.get("DISTILLCLIP_FLASH_HC")
    if env:
        # perf `flash_hc`: bad values fall back, not raise at trace time
        try:
            ehc = int(env)
        except ValueError:
            ehc = 0
        if ehc > 0 and h % ehc == 0:
            return ehc
    hc = h
    while hc > 1 and hc % 2 == 0 and hc * np_len > max_rows:
        hc //= 2
    return hc


def _rows_bias(np_len: int, n: int, causal: bool, hc: int) -> jnp.ndarray:
    """Block-diagonal(+causal+key-pad) bias for the packed [hc*Np, hc*Np]
    score matrix."""
    rows = hc * np_len
    row = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    ok = (row // np_len) == (col // np_len)
    ok = jnp.logical_and(ok, (col % np_len) < n)
    if causal:
        ok = jnp.logical_and(ok, (col % np_len) <= (row % np_len))
    return jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)


def _rows_fwd_kernel(qkv_ref, o_ref, lse_ref,
                     q_pk, k_pk, v_pk, *, scale, causal, gb, h, np_len, n, d):
    """Packed-rows attention forward.

    The FUSED qkv projection output is the single input ([rows, 3*H*d],
    lane-sliced here) — feeding three separate q/k/v operands made XLA
    materialize three [rows, HD] slices (pure copies, round-3 trace).
    Heads are packed onto sublanes through VMEM scratch STORES (Mosaic
    relayouts on store, unlike concat), giving one full-size MXU matmul
    per head chunk.
    """
    hc = _head_chunk(h, np_len)
    HD = h * d
    CH = hc * np_len
    bias = _rows_bias(np_len, n, causal, hc)
    # every (sample, chunk) iteration gets its OWN scratch region: reusing
    # one region across the loop is a write-after-read hazard Mosaic
    # mis-schedules on hardware — the later iteration's packing stores land
    # before the earlier iteration's dot reads, which silently corrupted
    # the scores (observed round 4: causal outputs ignored the mask for
    # gb >= 2 while gb=1 and interpret mode were exact)
    for s in range(gb):
        lo = s * np_len
        for c in range(h // hc):
            base = (s * (h // hc) + c) * CH
            for j in range(hc):
                i = c * hc + j
                dst = slice(base + j * np_len, base + (j + 1) * np_len)
                q_pk[dst, :] = qkv_ref[lo:lo + np_len, i * d:(i + 1) * d]
                k_pk[dst, :] = qkv_ref[lo:lo + np_len, HD + i * d:HD + (i + 1) * d]
                v_pk[dst, :] = qkv_ref[lo:lo + np_len, 2 * HD + i * d:2 * HD + (i + 1) * d]
            sm = jax.lax.dot_general(
                q_pk[base:base + CH, :], k_pk[base:base + CH, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            m = jnp.max(sm, axis=-1, keepdims=True)
            e = jnp.exp(sm - m)
            denom = jnp.sum(e, axis=-1, keepdims=True)
            p = (e / denom).astype(v_pk.dtype)
            o_pk = jax.lax.dot_general(
                p, v_pk[base:base + CH, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            lse_pk = m + jnp.log(denom)
            for j in range(hc):
                i = c * hc + j
                src = slice(j * np_len, (j + 1) * np_len)
                o_ref[lo:lo + np_len, i * d:(i + 1) * d] = o_pk[src, :].astype(o_ref.dtype)
                lse_ref[lo:lo + np_len, i:i + 1] = lse_pk[src, :]


def _rows_bwd_kernel(qkv_ref, o_ref, lse_ref, do_ref,
                     dqkv_ref,
                     q_pk, k_pk, v_pk, o_pk, do_pk, lse_pk,
                     *, scale, causal, gb, h, np_len, n, d):
    hc = _head_chunk(h, np_len)
    HD = h * d
    CH = hc * np_len
    bias = _rows_bias(np_len, n, causal, hc)
    # per-iteration scratch regions: see _rows_fwd_kernel (Mosaic WAR
    # hazard on reused scratch across the sample loop)
    for s in range(gb):
        lo = s * np_len
        for c in range(h // hc):
            base = (s * (h // hc) + c) * CH
            reg = slice(base, base + CH)
            for j in range(hc):
                i = c * hc + j
                sl = slice(i * d, (i + 1) * d)
                dst = slice(base + j * np_len, base + (j + 1) * np_len)
                q_pk[dst, :] = qkv_ref[lo:lo + np_len, i * d:(i + 1) * d]
                k_pk[dst, :] = qkv_ref[lo:lo + np_len, HD + i * d:HD + (i + 1) * d]
                v_pk[dst, :] = qkv_ref[lo:lo + np_len, 2 * HD + i * d:2 * HD + (i + 1) * d]
                o_pk[dst, :] = o_ref[lo:lo + np_len, sl]
                do_pk[dst, :] = do_ref[lo:lo + np_len, sl]
                lse_pk[dst, :] = lse_ref[lo:lo + np_len, i:i + 1]

            sm = jax.lax.dot_general(
                q_pk[reg, :], k_pk[reg, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + bias
            pmat = jnp.exp(sm - lse_pk[reg, :])
            pb = pmat.astype(q_pk.dtype)

            dv = jax.lax.dot_general(pb, do_pk[reg, :], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(do_pk[reg, :], v_pk[reg, :], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            delta = jnp.sum(
                do_pk[reg, :].astype(jnp.float32) * o_pk[reg, :].astype(jnp.float32),
                axis=-1, keepdims=True,
            )
            ds = (pmat * (dp - delta) * scale).astype(q_pk.dtype)
            dq = jax.lax.dot_general(ds, k_pk[reg, :], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(ds, q_pk[reg, :], (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            for j in range(hc):
                i = c * hc + j
                src = slice(j * np_len, (j + 1) * np_len)
                dqkv_ref[lo:lo + np_len, i * d:(i + 1) * d] = dq[src, :].astype(dqkv_ref.dtype)
                dqkv_ref[lo:lo + np_len, HD + i * d:HD + (i + 1) * d] = dk[src, :].astype(dqkv_ref.dtype)
                dqkv_ref[lo:lo + np_len, 2 * HD + i * d:2 * HD + (i + 1) * d] = dv[src, :].astype(dqkv_ref.dtype)


def _rows_call(kernel, n_out, args, rows_total, HD, gb, np_len, h, d, scale, causal, n):
    rows_blk = gb * np_len
    n_blocks = rows_total // rows_blk
    hc = _head_chunk(h, np_len)
    # one region per (sample, head-chunk) iteration (WAR hazard; see
    # _rows_fwd_kernel) — gb * (h/hc) regions of hc*np_len rows
    pk_rows = gb * (h // hc) * hc * np_len
    dtype = args[0].dtype
    blk3 = pl.BlockSpec((rows_blk, 3 * HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lse_blk = pl.BlockSpec((rows_blk, h), lambda i: (i, 0), memory_space=pltpu.VMEM)
    if n_out == 2:  # fwd: o + lse
        out_specs = (blk, lse_blk)
        out_shape = (
            jax.ShapeDtypeStruct((rows_total, HD), dtype),
            jax.ShapeDtypeStruct((rows_total, h), jnp.float32),
        )
        in_specs = [blk3]
        scratch = [pltpu.VMEM((pk_rows, d), dtype) for _ in range(3)]
    else:  # bwd: fused dqkv
        out_specs = blk3
        out_shape = jax.ShapeDtypeStruct((rows_total, 3 * HD), dtype)
        in_specs = [blk3, blk, lse_blk, blk]
        scratch = [pltpu.VMEM((pk_rows, d), dtype) for _ in range(5)] + [
            pltpu.VMEM((pk_rows, 1), jnp.float32)
        ]
    return pl.pallas_call(
        functools.partial(kernel, scale=scale, causal=causal, gb=gb, h=h,
                          np_len=np_len, n=n, d=d),
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)


def _pick_gb(b: int, np_len: int, hd: int) -> int:
    """Samples per program: bound block DMA footprint (~6 row buffers)."""
    for cand in (8, 4, 2, 1):
        if b % cand == 0 and cand * np_len * hd * 2 * 6 <= 8 * 1024 * 1024:
            return cand
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _flash_rows(qkv2, scale, causal, gb, np_len, h, d, n):
    o, _ = _flash_rows_fwd_impl(qkv2, scale, causal, gb, np_len, h, d, n)
    return o


def _flash_rows_fwd_impl(qkv2, scale, causal, gb, np_len, h, d, n):
    rows_total, HD3 = qkv2.shape
    return _rows_call(_rows_fwd_kernel, 2, (qkv2,), rows_total, HD3 // 3, gb,
                      np_len, h, d, scale, causal, n)


def _flash_rows_fwd(qkv2, scale, causal, gb, np_len, h, d, n):
    o, lse = _flash_rows_fwd_impl(qkv2, scale, causal, gb, np_len, h, d, n)
    return o, (qkv2, o, lse)


def _flash_rows_bwd(scale, causal, gb, np_len, h, d, n, res, do):
    qkv2, o, lse = res
    rows_total, HD3 = qkv2.shape
    dqkv = _rows_call(_rows_bwd_kernel, 1, (qkv2, o, lse, do), rows_total,
                      HD3 // 3, gb, np_len, h, d, scale, causal, n)
    return (dqkv,)


_flash_rows.defvjp(_flash_rows_fwd, _flash_rows_bwd)


def flash_attention_rows(
    q2: Array,
    k2: Array,
    v2: Array,
    *,
    heads: int,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> Array:
    """Fused attention on the natural [B, N, H*d] layout (unaligned N pads
    at the kernel boundary).

    Zero wrapper relayouts: inputs are direct slices of the fused QKV
    projection; the output feeds the out-projection unchanged.
    """
    B, N, HD = q2.shape
    of = flash_attention_rows_flat(
        q2.reshape(B * N, HD), k2.reshape(B * N, HD), v2.reshape(B * N, HD),
        heads=heads, seq=N, scale=scale, causal=causal, kv_len=kv_len,
    )
    return of.reshape(B, N, HD)


def flash_attention_rows_flat(
    qf: Array,
    kf: Array,
    vf: Array,
    *,
    heads: int,
    seq: int,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> Array:
    """Flat-rows API: q/k/v as [B*seq, H*d] (the towers' 2D rows mode).

    2D activations outside the kernel keep XLA's layout assignment on
    row-major layouts for the surrounding denses (BENCH_NOTES round 3).
    """
    # thin wrapper over the fused-qkv entry (the models feed the fused
    # projection output directly via flash_attention_rows_qkv)
    return flash_attention_rows_qkv(
        jnp.concatenate([qf, kf, vf], axis=1), heads=heads, seq=seq,
        scale=scale, causal=causal, kv_len=kv_len,
    )


def flash_attention_rows_qkv(
    qkvf: Array,
    *,
    heads: int,
    seq: int,
    scale: Optional[float] = None,
    causal: bool = False,
    kv_len: Optional[int] = None,
) -> Array:
    """Fused-projection API: qkv as ONE [B*seq, 3*H*d] array.

    The kernel lane-slices q/k/v in VMEM, so the fused qkv projection
    output feeds the custom call directly (no slice materializations) and
    the backward emits the fused dqkv the projection's transpose wants.
    """
    rows_total, HD3 = qkvf.shape
    HD = HD3 // 3
    d = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if seq % 16 != 0:
        # true-N rows mode: the tower runs at the real token count; pad to
        # the kernel's 16-multiple here and slice the context back.  Pad
        # keys are masked via kv_len (causal rows never see j >= seq
        # anyway); pad query rows are sliced off, and their cotangent is
        # zero by the pad transpose.
        bsz = rows_total // seq
        npk = _round_up(seq, 16)
        qkv3 = qkvf.reshape(bsz, seq, HD3)
        qkv3 = jnp.pad(qkv3, ((0, 0), (0, npk - seq), (0, 0)))
        out = flash_attention_rows_qkv(
            qkv3.reshape(bsz * npk, HD3), heads=heads, seq=npk, scale=scale,
            causal=causal,
            kv_len=min(kv_len, seq) if kv_len is not None else seq,
        )
        return out.reshape(bsz, npk, HD)[:, :seq].reshape(bsz * seq, HD)
    valid = kv_len if kv_len is not None else seq

    import os

    # Non-causal options, cheapest first (DISTILLCLIP_PLAIN_ATTN selects:
    # blockdiag | colcat | packed):
    #
    # * blockdiag (default where supported): per-head TRUE contractions
    #   packed hc = 128/d heads per dot — hc-fold MAC inflation instead of
    #   colcat's H-fold, with tiny per-chunk repeats instead of a full
    #   [HN, HD] expansion (blockdiag_attention.py).
    # * colcat: plain attention as the transform kernel with identity head
    #   mixes — vs the packed-rows kernel this halves the score/output MXU
    #   row-cycles and cuts the softmax element count hc-fold, but pays
    #   H-inflated dots + two [HN,HD] VPU mask-multiplies.
    # * packed: the original hc-sublane-packed rows kernel.
    #
    # Hardware A/B (fenced, v5e-1, BENCH_NOTES round 3b): micro 12L teacher
    # fwd 2.07 ms/layer blockdiag vs 2.55 colcat vs 2.73 packed; joint cached
    # E2E interleaved 85.97/86.17 ms blockdiag vs 88.42/88.16 colcat.
    mode = os.environ.get("DISTILLCLIP_PLAIN_ATTN", "blockdiag")
    # Causal towers (text students/teachers) have their own knob: the
    # block-diag kernel supports causal via one extra additive bias (masked
    # probs are exactly 0, so the save-P backward needs nothing), halving
    # MXU row-cycles vs the packed kernel (M=Np dots instead of M=hc*Np).
    # Hardware A/B (fenced, interleaved, v5e-1, round 4): live text stage
    # B=1024 — blockdiag 171.0/171.1 ms vs packed 175.7/176.1 ms; default
    # flipped to blockdiag.
    causal_mode = os.environ.get("DISTILLCLIP_CAUSAL_ATTN", "blockdiag")
    if causal and causal_mode == "blockdiag" and not _interpret():
        from distillclip_tpu.ops.blockdiag_attention import (
            blockdiag_attention_rows_qkv,
            blockdiag_supported,
        )

        if blockdiag_supported(heads, d, causal):
            return blockdiag_attention_rows_qkv(
                qkvf, heads=heads, seq=seq, scale=scale, causal=True,
                kv_len=kv_len,
            )
    if not causal and not _interpret():
        from distillclip_tpu.ops.blockdiag_attention import (
            blockdiag_attention_rows_qkv,
            blockdiag_supported,
        )

        if mode == "blockdiag" and blockdiag_supported(heads, d, causal):
            return blockdiag_attention_rows_qkv(
                qkvf, heads=heads, seq=seq, scale=scale, kv_len=kv_len,
            )
        if heads >= 12 and mode in ("colcat", "blockdiag"):
            from distillclip_tpu.ops.transform_attention import (
                transform_attention_rows_qkv,
            )

            eye = jnp.eye(heads, dtype=qkvf.dtype)
            return transform_attention_rows_qkv(
                qkvf, eye, eye, heads=heads, seq=seq, scale=scale,
                kv_len=kv_len,
            )

    def call(qkv):
        # block size from the (possibly per-shard) local batch
        gb = _pick_gb(qkv.shape[0] // seq, seq, HD)
        return _flash_rows(qkv, float(scale), bool(causal), gb, seq, heads,
                           d, valid)

    from distillclip_tpu.ops._shard import shard_rows_call

    # shard boundaries must align to whole sequences: samples = batch
    return shard_rows_call(call, (qkvf,), (), rows_total // seq)


# ---------------------------------------------------------------------------
# per-batch kernel with cross-head transforms (weight-share student)
# ---------------------------------------------------------------------------


def _tf_fwd_kernel(q_ref, k_ref, v_ref, wl_ref, ww_ref, o_ref, s3_ref, f2_ref,
                   *, scale, causal, gb, h, np_len, n):
    """Head-transform forward.

    Mosaic cannot shape-cast a batched-dot result [H,Np,Np]->[H,Np*Np]
    directly (layout-dependent), so values round-trip through VMEM scratch
    refs (s3_ref rank-3, f2_ref rank-2) to normalize the layout before the
    2D head-mix matmuls.
    """

    def body(b, _):
        q = q_ref[b]  # [H, Np, d]
        k = k_ref[b]
        v = v_ref[b]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale  # [H, Np, Np]
        s3_ref[...] = s
        s_flat = s3_ref[...].reshape(h, np_len * np_len)
        wl = wl_ref[...].astype(jnp.float32)
        f2_ref[...] = jax.lax.dot_general(
            wl, s_flat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        s2 = f2_ref[...].reshape(h, np_len, np_len)
        col = jax.lax.broadcasted_iota(jnp.int32, (np_len, np_len), 1)
        ok = col < n
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (np_len, np_len), 0)
            ok = jnp.logical_and(ok, col <= row)
        s2 = s2 + jnp.where(ok, 0.0, NEG_INF)[None].astype(jnp.float32)
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp(s2 - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        s3_ref[...] = p
        p_flat = s3_ref[...].reshape(h, np_len * np_len)
        ww = ww_ref[...].astype(jnp.float32)
        f2_ref[...] = jax.lax.dot_general(
            ww, p_flat, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        p2 = f2_ref[...].reshape(h, np_len, np_len).astype(v.dtype)
        o = jax.lax.dot_general(
            p2, v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        o_ref[b] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, gb, body, 0, unroll=True)


def _tf_fwd(q, k, v, wl, ww, scale, causal, n):
    B, H, Np, D = q.shape
    gb = 1
    for cand in (8, 4, 2, 1):
        if B % cand == 0:
            gb = cand
            break
    blk = pl.BlockSpec((gb, H, Np, D), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((H, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tf_fwd_kernel, scale=scale, causal=causal, gb=gb,
                          h=H, np_len=Np, n=n),
        grid=(B // gb,),
        in_specs=[blk, blk, blk, w_blk, w_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, H, Np, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((H, Np, Np), jnp.float32),
            pltpu.VMEM((H, Np * Np), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v, wl, ww)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash_tf(q, k, v, wl, ww, scale, causal, n):
    return _tf_fwd(q, k, v, wl, ww, scale, causal, n)


def _flash_tf_fwd(q, k, v, wl, ww, scale, causal, n):
    o = _tf_fwd(q, k, v, wl, ww, scale, causal, n)
    return o, (q, k, v, wl, ww)


def _flash_tf_bwd(scale, causal, n, res, do):
    """XLA recompute backward for the transform variant.

    The double head-mix entangles heads; the recompute path still avoids the
    fp32 HBM score round-trips of a naive forward+backward pair because the
    forward never stored them.
    """
    q, k, v, wl, ww = res
    Np = q.shape[2]

    def fwd(q, k, v, wl, ww):
        f32 = jnp.float32
        s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(f32), k.astype(f32)) * scale
        s = jnp.einsum("hg,bgnm->bhnm", wl.astype(f32), s)
        col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
        ok = col < n
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 0)
            ok = jnp.logical_and(ok, col <= row)
        s = s + jnp.where(ok, 0.0, NEG_INF)[None, None]
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
    kv_len: Optional[int] = None,
) -> Array:
    """Fused attention for [B, H, N, d] inputs (N <= 256).

    ``head_transform=(Wl, Ww)``: apply [H, H] mixes to logits (pre-softmax)
    and probs (post-softmax) — the weight-share student's conv_l/conv_w.

    ``kv_len``: number of VALID tokens when the caller already padded the
    sequence (tower-level padding); keys/queries beyond it are masked.  When
    N is already a 16-multiple and kv_len is given, no wrapper pad/slice is
    emitted at all — the fully fused path.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    if N > 256:
        raise ValueError(f"short-sequence fused attention requires N<=256, got {N}")
    valid = kv_len if kv_len is not None else N

    np_len = _round_up(N, 16)
    pad = np_len - N

    from distillclip_tpu.ops._shard import shard_rows_call

    padcfg = ((0, 0), (0, 0), (0, pad), (0, 0))

    if head_transform is not None:
        # KNOWN LIMITATION: the head-transform kernel needs a
        # [H, Np, Np] -> [H, Np*Np] view for the MXU head-mix, which
        # Mosaic's layout inference rejects when the source is a batched-dot
        # output (store/load round-trips get forwarded away).  On hardware
        # the transform path therefore runs the unfused XLA math; the kernel
        # stays live in interpret mode and tests for when Mosaic grows the
        # relayout.
        if not _interpret():
            return reference_attention(
                q, k, v, scale=scale, causal=causal,
                head_transform=head_transform, kv_len=kv_len,
                precise=q.dtype == jnp.float32,
            )
        wl, ww = head_transform

        def call_tf(q, k, v, wl, ww):
            if pad:
                q, k, v = (jnp.pad(t, padcfg) for t in (q, k, v))
            o = _flash_tf(q, k, v, wl, ww, float(scale), bool(causal), valid)
            return o[:, :, :N]

        return shard_rows_call(call_tf, (q, k, v), (wl, ww), B)

    def call(q, k, v):
        b = q.shape[0]  # local batch under shard_map
        g = _pick_group(b * H, np_len)
        if pad:
            q, k, v = (jnp.pad(t, padcfg) for t in (q, k, v))
        qf = q.reshape(b * H * np_len, D)
        kf = k.reshape(b * H * np_len, D)
        vf = v.reshape(b * H * np_len, D)
        of = _flash_packed(qf, kf, vf, float(scale), bool(causal), g, np_len, valid)
        o = of.reshape(b, H, np_len, D)
        return o if pad == 0 else o[:, :, :N]

    return shard_rows_call(call, (q, k, v), (), B)


def reference_attention(
    q: Array, k: Array, v: Array, *, scale: Optional[float] = None,
    causal: bool = False, head_transform=None, kv_len: Optional[int] = None,
    precise: bool = True,
) -> Array:
    """Unfused XLA attention with identical math (for testing/fallback).

    ``precise=False`` keeps the [B,H,N,N] score/prob buffers in the input
    dtype (bf16 on TPU) — the hardware fallback for the head-transform path
    uses this to halve its HBM traffic; tests always compare precise=True.
    """
    B, H, N, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    buf_dtype = jnp.float32 if precise else q.dtype
    s = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ).astype(buf_dtype) * jnp.asarray(scale, buf_dtype)
    if head_transform is not None:
        s = jnp.einsum("hg,bgnm->bhnm", head_transform[0].astype(s.dtype), s,
                       preferred_element_type=buf_dtype)
    if causal or (kv_len is not None and kv_len < N):
        row = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        ok = jnp.ones((N, N), bool)
        if causal:
            ok = jnp.logical_and(ok, col <= row)
        if kv_len is not None and kv_len < N:
            ok = jnp.logical_and(ok, col < kv_len)
        s = s + jnp.where(ok, 0.0, NEG_INF)[None, None].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(buf_dtype)
    if head_transform is not None:
        p = jnp.einsum("hg,bgnm->bhnm", head_transform[1].astype(p.dtype), p,
                       preferred_element_type=buf_dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v).astype(q.dtype)
