"""Fused head-transform attention — conv mixes folded into the two matmuls.

The weight-share student's attention applies [H, H] cross-head mixes to the
logits (conv_l, pre-softmax) and probs (conv_w, post-softmax)
(reference weight_share_model.py:114-121), which defeats per-head fusion
and makes the transform path the most expensive attention in the step.

Key identity (scores are bilinear in q and k, so the cross-head weight can
ride on K; the output is linear in probs and v, so conv_w can ride on V):

* conv_l:  s2[i,(h,j)] = sum_{g,d} q[i,(g,d)] * Wl[h,g] * k[j,(g,d)]
           = dot(q, WLX * repeat(k, H), contract features)         -- colcat
* conv_w:  o[i,(h,d)]  = sum_{g,j} p[i,(g,j)] * Ww[h,g] * v[j,(h,d)]
           = dot(p_colcat, WWX * repeat(v, H))     -- NATURAL layout output

with the weight-expansion masks WLX[(h,j),(g,d)] = Wl[h,g] and
WWX[(g,j),(h,d)] = Ww[h,g] built ONCE per kernel invocation by
block-indicator matmuls into persistent VMEM scratch (grid step 0 only —
rebuilding them every grid step cost ~0.5 ms/layer at text shapes).  Each
sample's attention is then: one tile-repeat + one VPU multiply + ONE
MXU-shaped matmul on each side of a block softmax (global-row max, f32
exp, per-head-block denominators via an indicator matmul, 1e-30 underflow
guard).

Mosaic rules encoded here (probed on hardware, see BENCH_NOTES.md):
matmul accumulators must be 32-bit; iotas built as [N,1]x[1,N] broadcast
compares (full 2D iota pairs OOM the scoped-VMEM budget); pltpu.repeat
TILES its operand (exactly what the repeat(k/v, H) stacking needs);
broadcast adds are safe on plain 2D dot outputs (NOT on batched-dot
outputs, which SIGABRT the compiler).

Measured on v5e (B=128, H=24, Np=64, d=32, 6 layers): forward 3.39 ms at
gb=16 vs 4.81 ms for the unfused XLA path.  The backward defaults to the
fused save-P kernel since round 3 (the forward emits its bf16 probs as a
second output; DISTILLCLIP_TF_BWD=xla opts back to XLA recompute).  Shape
dispatch, the earlier formulations, and why they lost are recorded in
BENCH_NOTES.md.
"""

from __future__ import annotations

import functools
import math
import os
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


def _interleave(gb: int) -> int:
    """Samples whose kernel stages are emitted interleaved (ILP distance).

    DISTILLCLIP_TF_IL overrides; rounded down to a divisor of gb.  Measured
    NEUTRAL on v5e at 1/2/4/8 (Mosaic schedules the serial per-sample chain
    as well either way); kept because the staged form is what the scratch
    and ablation experiments run on.
    """
    il = int(os.environ.get("DISTILLCLIP_TF_IL", "4"))
    while gb % il:
        il //= 2
    return max(il, 1)


def _build_mix_expansions(wl_ref, ww_ref, h, np_len, d,
                          wlx_ref, wwx_ref):
    """WLX[(h,j),(g,d)] = wl[h,g]; WWX[(g,j),(h,d)] = ww[h,g].

    Built by block-indicator matmuls into persistent scratch at grid step 0
    only: the [HN,h]@[h,HD] expansion dots cost ~M=HN row-cycles each, and
    rebuilding them every grid step was ~5% of the kernel (B/gb rebuilds).
    Returns (Drow, Dsm, WLX, WWX) values for the current step.
    """
    HN = h * np_len
    HD = h * d
    # block indicators ([rows -> head index]); [X,1]x[1,h] compares keep the
    # scoped-VMEM cost tiny compared to full 2D iota pairs
    r1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 1)
    Drow = (r1 // np_len == c1).astype(jnp.float32)          # [(x,j) -> x]

    @pl.when(pl.program_id(0) == 0)
    def _build():
        r2 = jax.lax.broadcasted_iota(jnp.int32, (HD, h), 0)
        c2 = jax.lax.broadcasted_iota(jnp.int32, (HD, h), 1)
        Dcol = (r2 // d == c2).astype(jnp.float32)           # [(x,d) -> x]
        wl = wl_ref[...].astype(jnp.float32)
        ww = ww_ref[...].astype(jnp.float32)
        # WLX : Drow @ wl @ Dcol^T
        t1 = jax.lax.dot_general(Drow, wl, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        wlx_ref[...] = jax.lax.dot_general(
            t1, Dcol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        # WWX : Drow @ ww^T @ Dcol^T
        t2 = jax.lax.dot_general(Drow, ww, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        wwx_ref[...] = jax.lax.dot_general(
            t2, Dcol, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    return Drow, Drow.astype(jnp.bfloat16), wlx_ref[...], wwx_ref[...]


def _tf_kernel(qkv_ref, wl_ref, ww_ref, o_ref, p_ref=None, wlx_ref=None,
               wwx_ref=None, *, scale, gb, h, np_len, n, d):
    """qkv_ref: fused [rows_blk, 3*HD] projection output.

    Taking the fused array as ONE operand (lane-sliced in VMEM, 768 is a
    128-multiple) instead of three q/k/v operands removes the three
    [rows, HD] slice materializations XLA otherwise emits to feed the
    custom call — 4.6 ms/step of pure copies in the round-3 text trace.
    """
    HN = h * np_len
    HD = h * d
    Drow, Dsm, WLX, WWX = _build_mix_expansions(
        wl_ref, ww_ref, h, np_len, d, wlx_ref, wwx_ref)

    # kv-pad mask on colcat lanes ([1,HN]; broadcasts over the row dim)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, HN), 1)
    kv_bias = jnp.where((ccol % np_len) < n, 0.0, NEG_INF).astype(jnp.float32)

    # Sample-interleaved stages: the per-sample chain is a strict
    # MXU->VPU->MXU dependency (score dot -> softmax -> output dot), so a
    # plain per-sample loop serializes the units.  Emitting each stage for
    # `il` independent samples back-to-back gives the Mosaic scheduler
    # nearby independent work to overlap MXU and VPU issue.
    il = _interleave(gb)
    for base in range(0, gb, il):
        los = [(base + t) * np_len for t in range(il)]
        # 1) conv_l-mixed scores, ONE matmul into colcat [Np, (h,j)]
        s2s = []
        for lo in los:
            kx = pltpu.repeat(qkv_ref[lo:lo + np_len, HD:2 * HD], h, 0)
            s2s.append(jax.lax.dot_general(
                qkv_ref[lo:lo + np_len, 0:HD], WLX * kx,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale + kv_bias)
        # 2) block softmax with global-row max; per-head-block denominators
        es = []
        for s2 in s2s:
            m = jnp.max(s2, axis=-1, keepdims=True)
            es.append(jnp.exp(s2 - m))
        pbs = []
        for lo, e in zip(los, es):
            denom = jax.lax.dot_general(
                e.astype(jnp.bfloat16), Dsm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Np, h]
            denom_full = jax.lax.dot_general(
                denom, Drow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Np, HN]
            # guard: with a global-row max, a head whose logits sit far
            # below another head's can underflow entirely; keep it at
            # zero, not NaN
            pb = (es[len(pbs)] / jnp.maximum(denom_full, 1e-30)
                  ).astype(jnp.bfloat16)
            pbs.append(pb)
            if p_ref is not None:
                # save-P training path: the backward reuses exactly the
                # bf16 probs the output matmul consumed (no recompute)
                p_ref[lo:lo + np_len, :] = pb
        # 3) conv_w-mixed output, ONE matmul emitting the natural layout
        for lo, pb in zip(los, pbs):
            vx = pltpu.repeat(qkv_ref[lo:lo + np_len, 2 * HD:3 * HD], h, 0)
            o = jax.lax.dot_general(
                pb, WWX * vx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)          # [Np, HD]
            o_ref[lo:lo + np_len, :] = o.astype(o_ref.dtype)


def _tf_fwd_call(qkv2, wl, ww, scale, n, gb, np_len, h, d, save_p=False):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((rows_blk, h * np_len), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_specs = (blk, p_blk) if save_p else blk
    out_shape = (
        (jax.ShapeDtypeStruct((rows_total, HD), qkv2.dtype),
         jax.ShapeDtypeStruct((rows_total, h * np_len), jnp.bfloat16))
        if save_p else jax.ShapeDtypeStruct((rows_total, HD), qkv2.dtype)
    )
    body = functools.partial(_tf_kernel, scale=scale, gb=gb, h=h,
                             np_len=np_len, n=n, d=d)
    if save_p:
        kern = lambda q, l, w, o, p, wlx, wwx: body(
            q, l, w, o, p, wlx_ref=wlx, wwx_ref=wwx)
    else:
        kern = lambda q, l, w, o, wlx, wwx: body(
            q, l, w, o, None, wlx_ref=wlx, wwx_ref=wwx)
    return pl.pallas_call(
        kern,
        grid=(rows_total // rows_blk,),
        in_specs=[blk3, w_blk, w_blk],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((h * np_len, HD), jnp.bfloat16),
                        pltpu.VMEM((h * np_len, HD), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            # WLX/WWX and the per-sample repeats are [HN,HD] register-resident
            # values (~2.3MB each bf16 at H=24,Np=64); 16MB default is tight
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv2, wl, ww)


def _tf_bwd_kernel(qkv_ref, wl_ref, ww_ref, do_ref, p_ref,
                   dqkv_ref, dwl_ref, dww_ref, wlx_ref, wwx_ref,
                   *, scale, gb, h, np_len, n, d):
    """Fused save-P backward (round-3 rework; BENCH_NOTES 'Next levers' 2).

    vs the round-2 recompute backward:
    * P is read back from the forward kernel (bf16, exactly the probs the
      output matmul consumed) — no score recompute, no softmax chain;
    * the two Esel row-sum MATMULS are replaced by H row-slice ADDS
      (true-FLOP: summing H row blocks is a VPU add, not an [Np,HN]x[HN,HD]
      contraction).

    Remaining matmuls per sample: dP, dVp, dq, dKp (the colcat-inherent
    H-inflated four).  The dwl/dww reductions are NOT cheap per sample —
    at image shapes (h=24, Np=64) the [HN,HD]@[HD,h] reduction costs the
    same MXU row-cycles as a main dot for a [h,h]-sized result — but the
    weight grads sum over samples, and the Dcol/Drow chains are linear, so
    the elementwise products accumulate in f32 across the gb loop and the
    reduction matmuls run ONCE per grid step (1/gb the cycles).  `scale`
    is folded into dS (one [Np,HN] multiply) instead of scaling the dq and
    dKp dot outputs ([Np,HD] + [HN,HD] multiplies).
    """
    HN = h * np_len
    HD = h * d
    Drow, Dsm, WLX, WWX = _build_mix_expansions(
        wl_ref, ww_ref, h, np_len, d, wlx_ref, wwx_ref)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (HD, h), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (HD, h), 1)
    Dcol = (r2 // d == c2).astype(jnp.float32)
    wl = wl_ref[...].astype(jnp.float32)
    ww = ww_ref[...].astype(jnp.float32)

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dww_ref[...] = jnp.zeros_like(dww_ref)

    # dv[j,(h,d)] = sum_g ww[h,g] * dVp[(g,j),(h,d)] and
    # dk[j,(g,d)] = sum_h wl[h,g] * dKp[(h,j),(g,d)]: instead of a full
    # [HN,HD] mask-multiply (dVw/dKw) followed by a block sum, weight each
    # row block by a broadcast [1,HD] row of the mix during the tree sum —
    # the per-block multiplies become FMA leaves and the two [HN,HD]
    # intermediates disappear.  WWrow[g,(h,d)] = ww[h,g];
    # WLrow[h,(g,d)] = wl[h,g] (one-hot expansions, once per grid step).
    WWrow = jax.lax.dot_general(ww, Dcol, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [g, HD]
    WLrow = jax.lax.dot_general(wl, Dcol, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)  # [h, HD]

    def wblock_sum(x32, wrow):
        # sum_b wrow[b] (*) x32[b-block] -> [Np, HD]: tree-paired weighted
        # VPU adds (a serial h-chain starves the VPU of ILP at h=24)
        parts = [x32[b * np_len:(b + 1) * np_len, :] * wrow[b:b + 1, :]
                 for b in range(h)]
        while len(parts) > 1:
            nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
            if len(parts) % 2:
                nxt.append(parts[-1])
            parts = nxt
        return parts[0]

    dwwE = jnp.zeros((HN, HD), jnp.float32)
    dwlE = jnp.zeros((HN, HD), jnp.float32)

    # Stage-interleaved sample loop (see _tf_kernel): each sample's chain
    # alternates MXU and VPU; emitting stages for `il` independent samples
    # back-to-back lets the scheduler overlap the units.  The dwwE/dwlE
    # accumulation order over samples is unchanged (still ascending s), so
    # weight grads stay bit-identical to the serial loop.
    il = _interleave(gb)
    for base in range(0, gb, il):
        los = [(base + t) * np_len for t in range(il)]
        kxs = [pltpu.repeat(qkv_ref[lo:lo + np_len, HD:2 * HD], h, 0)
               for lo in los]
        vxs = [pltpu.repeat(qkv_ref[lo:lo + np_len, 2 * HD:3 * HD], h, 0)
               for lo in los]
        pbs = [p_ref[lo:lo + np_len, :] for lo in los]  # [Np, HN] bf16
        dos = [do_ref[lo:lo + np_len, :] for lo in los]
        # ---- output side
        dPs = [jax.lax.dot_general(
            do_blk, WWX * vx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # [Np, HN]
            for do_blk, vx in zip(dos, vxs)]
        dVps = [jax.lax.dot_general(
            pb, do_blk, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # [HN, HD]
            for pb, do_blk in zip(pbs, dos)]
        for lo, dVp in zip(los, dVps):
            dqkv_ref[lo:lo + np_len, 2 * HD:3 * HD] = (
                wblock_sum(dVp, WWrow).astype(dqkv_ref.dtype))
        for dVp, vx in zip(dVps, vxs):
            dwwE += dVp * vx.astype(jnp.float32)
        # ---- block-local softmax backward (scale folded into dS: dq and
        # dKp are linear in dS, so one [Np,HN] multiply covers both)
        pdps = [(pb.astype(jnp.float32) * dP).astype(jnp.bfloat16)
                for pb, dP in zip(pbs, dPs)]
        tfulls = []
        for pdp in pdps:
            tsum = jax.lax.dot_general(
                pdp, Dsm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)      # [Np, h]
            tfulls.append(jax.lax.dot_general(
                tsum, Drow, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))
        dSs = [(pb.astype(jnp.float32) * scale * (dP - tfull)
                ).astype(jnp.bfloat16)                   # [Np, HN]
               for pb, dP, tfull in zip(pbs, dPs, tfulls)]
        # ---- score side
        for lo, dS, kx in zip(los, dSs, kxs):
            dqkv_ref[lo:lo + np_len, 0:HD] = jax.lax.dot_general(
                dS, WLX * kx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
        dKps = [jax.lax.dot_general(
            dS, qkv_ref[lo:lo + np_len, 0:HD], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [HN, HD] (scaled)
            for lo, dS in zip(los, dSs)]
        for lo, dKp in zip(los, dKps):
            dqkv_ref[lo:lo + np_len, HD:2 * HD] = (
                wblock_sum(dKp, WLrow).astype(dqkv_ref.dtype))
        for dKp, kx in zip(dKps, kxs):
            dwlE += dKp * kx.astype(jnp.float32)

    # Contract the big HN row dim FIRST with the small one-hot operand on
    # the M side (M=h row-cycles), not the [HN,HD]@[HD,h] orientation whose
    # M=HN streams as many MXU rows as a main dot.  Full-f32 dots: they run
    # once per grid step now, and rounding the accumulated sums to bf16
    # would make dwl/dww visibly depend on the gb grouping (sharded vs
    # unsharded paths diverged past 2e-4).
    # dVp rows are (g,j) blocks, so the row contraction lands [g, HD] and
    # the (h,d)-column contraction is arranged to emit [h, g] directly.
    tw = jax.lax.dot_general(
        Drow, dwwE, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [g, (h,d)]
    dww_ref[...] += jax.lax.dot_general(
        Dcol, tw, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [h, g]
    tl = jax.lax.dot_general(Drow, dwlE, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [h, (g,d)]
    dwl_ref[...] += jax.lax.dot_general(
        tl, Dcol, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [h, g]


def _tf_bwd_call(qkv2, wl, ww, do2, p2, scale, n, gb, np_len, h, d):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((rows_blk, h * np_len), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tf_bwd_kernel, scale=scale, gb=gb, h=h,
                          np_len=np_len, n=n, d=d),
        grid=(rows_total // rows_blk,),
        in_specs=[blk3, w_blk, w_blk, blk, p_blk],
        out_specs=[blk3, w_blk, w_blk],
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, HD3), qkv2.dtype),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((h * np_len, HD), jnp.bfloat16),
                        pltpu.VMEM((h * np_len, HD), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv2, wl, ww, do2, p2)


def _xla_transform_rows(q2, k2, v2, wl, ww, scale, n, heads):
    """Reference math on the rows layout (used for the backward recompute)."""
    B, N, HD = q2.shape
    d = HD // heads
    to4 = lambda t: t.reshape(B, N, heads, d).transpose(0, 2, 1, 3)
    q, k, v = to4(q2), to4(k2), to4(v2)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    s = s.astype(q2.dtype) * jnp.asarray(scale, q2.dtype)
    s = jnp.einsum("hg,bgnm->bhnm", wl.astype(s.dtype), s,
                   preferred_element_type=q2.dtype)
    if n < N:
        coli = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
        s = s + jnp.where(coli < n, 0.0, NEG_INF)[None, None].astype(s.dtype)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q2.dtype)
    p = jnp.einsum("hg,bgnm->bhnm", ww.astype(p.dtype), p,
                   preferred_element_type=q2.dtype)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    return o.transpose(0, 2, 1, 3).reshape(B, N, HD).astype(q2.dtype)


def _pick_gb(B: int, cap: int = 16) -> int:
    # gb sweep on v5e (6L fwd, B=128): 1->5.98, 2->4.74, 4->5.22, 8->3.56,
    # 16->3.39 ms — bigger row blocks amortize the mask builds and bubbles
    for cand in (16, 8, 4, 2, 1):
        if cand <= cap and B % cand == 0:
            return cand
    return 1


def _fwd_gb(B: int) -> int:
    """Forward row-block size; DISTILLCLIP_TF_GB overrides for tuning
    (hardware A/B round 4, interleaved, image student step B=256:
    gb=32 43.31 ms vs gb=16 39.20/39.23 ms — 16 stays the default)."""
    env = os.environ.get("DISTILLCLIP_TF_GB")
    if env:
        # config-settable knob (perf `tf_gb`): a bad value must fall back,
        # not raise ZeroDivisionError/ValueError at trace time (advisor r4)
        try:
            gb = int(env)
        except ValueError:
            gb = 0
        if gb > 0 and B % gb == 0:
            return gb
    return _pick_gb(B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _tf_flat_qkv(qkvf, wl, ww, scale, n, heads, np_len):
    rows_total, HD3 = qkvf.shape
    d = HD3 // 3 // heads
    gb = _fwd_gb(rows_total // np_len)
    return _tf_fwd_call(qkvf, wl, ww, float(scale), n, gb, np_len, heads, d)


def _bwd_mode() -> str:
    """'kernel' (save-P fused backward) or 'xla' (recompute via XLA).

    Round 3 reworked the fused backward: the forward saves its bf16 probs
    (no in-kernel score recompute) and the Esel row-sum matmuls became
    row-slice adds, leaving the four colcat-inherent matmuls.  Keeping the
    whole differentiated region out of XLA's attention graph also fixes the
    batch-minor layout poisoning of the surrounding denses (BENCH_NOTES
    round-3): cached text step 177.2 ms kernel vs 193.9 XLA even BEFORE the
    save-P rework.  'xla' remains as a fallback/debug path.
    """
    import os

    return os.environ.get("DISTILLCLIP_TF_BWD", "kernel")


def _tf_flat_qkv_fwd(qkvf, wl, ww, scale, n, heads, np_len):
    rows_total, HD3 = qkvf.shape
    d = HD3 // 3 // heads
    gb = _fwd_gb(rows_total // np_len)
    if _bwd_mode() == "kernel":
        # save-P training path: the forward also emits the bf16 probs so the
        # fused backward skips the score recompute entirely
        of, pf = _tf_fwd_call(qkvf, wl, ww, float(scale), n, gb, np_len,
                              heads, d, save_p=True)
        return of, (qkvf, wl, ww, pf)
    of = _tf_fwd_call(qkvf, wl, ww, float(scale), n, gb, np_len, heads, d)
    return of, (qkvf, wl, ww, None)


def _tf_flat_qkv_bwd(scale, n, heads, np_len, res, do):
    qkvf, wl, ww, pf = res
    rows_total, HD3 = qkvf.shape
    HD = HD3 // 3
    if pf is None:
        B = rows_total // np_len

        def f3(qkv, l, w):
            to3 = lambda t: t.reshape(B, np_len, HD)
            return _xla_transform_rows(
                to3(qkv[:, 0:HD]), to3(qkv[:, HD:2 * HD]),
                to3(qkv[:, 2 * HD:]), l, w, scale, n, heads
            ).reshape(rows_total, HD)

        _, vjp = jax.vjp(f3, qkvf, wl, ww)
        return vjp(do)
    d = HD // heads
    import os

    # bwd block sweep at text B=1024 (fenced, round 3): gb=16 -> 154.5,
    # gb=8 -> 153.0, gb=4 -> 153.8 ms full step; the backward holds ~2x the
    # forward's live blocks (qkv,do,p + grads), so half the forward's
    # row block pipelines better.  At wide-head shapes the blocks are wider
    # still (HN=1536 scratch per sample at h=24): image-shape microbench
    # (B=256, N=64, H=24, 6L f+b, fenced) gb=8 -> 20.8, gb=4 -> 19.0-19.5,
    # gb=2 -> 20.4 ms, so the cap halves again at heads >= 16
    gb = _pick_gb(rows_total // np_len, cap=4 if heads >= 16 else 8)
    gb_env = os.environ.get("DISTILLCLIP_TF_BWD_GB")
    if gb_env:
        # bwd block-size override for tuning (perf `tf_bwd_gb`); bad
        # values fall back, not raise at trace time
        try:
            egb = int(gb_env)
        except ValueError:
            egb = 0
        if egb > 0 and (rows_total // np_len) % egb == 0:
            gb = egb
    dqkv, dwl, dww = _tf_bwd_call(
        qkvf, wl, ww, do, pf, float(scale), n, gb, np_len, heads, d)
    return dqkv, dwl.astype(wl.dtype), dww.astype(ww.dtype)


_tf_flat_qkv.defvjp(_tf_flat_qkv_fwd, _tf_flat_qkv_bwd)


def transform_attention_rows(
    q2: Array, k2: Array, v2: Array, wl: Array, ww: Array,
    *, heads: int, scale: Optional[float] = None, kv_len: Optional[int] = None,
) -> Array:
    """Fused head-transform attention on the natural [B, N, H*d] layout.

    N must be a 16-multiple (tower-level padding); ``kv_len`` masks pad keys.
    """
    B, N, HD = q2.shape
    of = transform_attention_rows_flat(
        q2.reshape(B * N, HD), k2.reshape(B * N, HD), v2.reshape(B * N, HD),
        wl, ww, heads=heads, seq=N, scale=scale, kv_len=kv_len,
    )
    return of.reshape(B, N, HD)


def transform_attention_rows_flat(
    qf: Array, kf: Array, vf: Array, wl: Array, ww: Array,
    *, heads: int, seq: int, scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> Array:
    """Flat-rows API: q/k/v as [B*seq, H*d] (the towers' 2D rows mode).

    Keeping every tensor 2D outside the kernel stops XLA from assigning
    batch-minor layouts to the surrounding denses (BENCH_NOTES round 3:
    rank-3 [B,77,768] towers sit at 35-58% MFU, the same math flattened
    to rows runs at ~80%).
    """
    # thin wrapper over the fused-qkv entry (the models feed the fused
    # projection output directly via transform_attention_rows_qkv; this
    # 3-operand API re-fuses with one concat — unit-test / rank-3 path)
    return transform_attention_rows_qkv(
        jnp.concatenate([qf, kf, vf], axis=1), wl, ww,
        heads=heads, seq=seq, scale=scale, kv_len=kv_len,
    )


def transform_attention_rows_qkv(
    qkvf: Array, wl: Array, ww: Array,
    *, heads: int, seq: int, scale: Optional[float] = None,
    kv_len: Optional[int] = None,
) -> Array:
    """Fused-projection API: qkv as ONE [B*seq, 3*H*d] array.

    The kernel lane-slices q/k/v in VMEM, so the fused projection output
    feeds the custom call directly — no [rows, HD] slice materializations
    (4.6 ms/step of pure copies in the round-3 text trace), and the
    backward emits the fused dqkv the projection's transpose wants.
    """
    rows_total, HD3 = qkvf.shape
    HD = HD3 // 3
    d = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    n = kv_len if kv_len is not None else seq
    # Measured dispatch (v5e, 6 layers, B=128): the folded kernel wins at
    # wide-head shapes (H=24: fwd 3.94 vs 4.8 ms) where XLA's [B,H,N,N]
    # buffers hurt most, and loses at narrow-head shapes (H=8, d=64:
    # fwd 2.43 vs 2.32, f+b 5.38 vs 3.60) where the H-inflated folded
    # matmuls cost more than XLA's smaller score buffers.
    # (interpret mode always runs the kernel so tests keep covering it)
    if heads < 12 and not _interpret():
        B = rows_total // seq
        to3 = lambda t: t.reshape(B, seq, HD)
        return _xla_transform_rows(
            to3(qkvf[:, 0:HD]), to3(qkvf[:, HD:2 * HD]), to3(qkvf[:, 2 * HD:]),
            wl, ww, float(scale), int(n), heads
        ).reshape(rows_total, HD)
    if seq % 16 != 0:
        # true-N rows mode (ops/flash_attention.true_n_rows_enabled): pad to
        # the kernel's 16-multiple at the kernel boundary only; the XLA
        # fallback above handles unaligned N natively so it never pads.
        bsz = rows_total // seq
        npk = -(-seq // 16) * 16
        qkv3 = qkvf.reshape(bsz, seq, HD3)
        qkv3 = jnp.pad(qkv3, ((0, 0), (0, npk - seq), (0, 0)))
        out = transform_attention_rows_qkv(
            qkv3.reshape(bsz * npk, HD3), wl, ww, heads=heads, seq=npk,
            scale=scale, kv_len=min(n, seq),
        )
        return out.reshape(bsz, npk, HD)[:, :seq].reshape(bsz * seq, HD)
    from distillclip_tpu.ops._shard import shard_rows_call

    impl = os.environ.get("DISTILLCLIP_TF_IMPL", "colcat")
    if impl == "factored":
        # true-FLOP per-head formulation (transform_factored.py); opt-in
        # until the hardware A/B says it wins (BENCH_NOTES round 3)
        from distillclip_tpu.ops.transform_factored import tf_factored_qkv

        return shard_rows_call(
            lambda qkv, l, w: tf_factored_qkv(
                qkv, l, w, float(scale), int(n), int(heads), int(seq)
            ),
            (qkvf,), (wl, ww), rows_total // seq,
        )

    # per-shard under an active mesh (ops/_shard.py): rows sharded on whole
    # samples, wl/ww replicated with their grads psum'd by the transpose
    return shard_rows_call(
        lambda qkv, l, w: _tf_flat_qkv(
            qkv, l, w, float(scale), int(n), int(heads), int(seq)
        ),
        (qkvf,), (wl, ww), rows_total // seq,
    )
