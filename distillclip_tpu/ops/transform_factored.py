"""Factorized head-transform attention — true-FLOP per-head dots + VPU mixes.

The colcat kernel (transform_attention.py) folds the conv_l/conv_w head
mixes (reference weight_share_model.py:114-121) into two MXU matmuls over
``[HN, HD]`` operands.  That is MXU-shaped but pays an H-fold FLOP
inflation: every output head-block contracts the FULL feature dim (HD)
when the true math per head only needs d — 12x at text shapes (h=12),
24x at image shapes (h=24).

This module factorizes instead:

* per-head score dots      S_j  = q_j k_j^T * scale        (true FLOPs)
* conv_l mix on the VPU    S'_b = sum_j wl[b,j] * S_j      (h^2 tile FMAs)
* row softmax              P'_b = softmax_kv(S'_b + kv_bias)
* conv_w mix on the VPU    Pm_g = sum_b ww[g,b] * P'_b
* per-head output dots     o_g  = Pm_g v_g

Everything lives in a sublane-packed ``[h*Np, Np]`` scratch layout (kv
positions on lanes), so softmax is a plain row reduction (per-head row
max — no cross-head underflow guard needed, unlike the colcat block
softmax).  All per-head operands are direct lane slices of the fused qkv
block — no packing scratch.  Score/dPm dots have two strategies
(``DISTILLCLIP_TF_SCORES``, see ``_scores_mode``): true-FLOP 'perhead'
K=d dots (default) or 'scaled' full-K chunk dots with the mix folded
onto q.  The head mixes run as h^2 aligned tile FMAs or h roll passes
(``DISTILLCLIP_TF_MIX=roll``, for large h).

The backward reuses the saved probs P' (same save-P strategy as the
colcat kernel) and is true-FLOP on the output side: dv/dq/dk per-head
dots, the two un-mixes as tile FMAs, and dwl/dww via
repeat+lane-reduce+indicator matmuls.

Selected via ``DISTILLCLIP_TF_IMPL=factored`` (see
transform_attention.transform_attention_rows_qkv); the colcat kernel
stays the default until the hardware A/B says otherwise (BENCH_NOTES).
"""

from __future__ import annotations

import functools

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


def _pick_hc(h: int, np_len: int) -> int:
    """Output-head rows per scaled-operand chunk dot ('scaled' mode only).

    Larger hc = fewer, larger [hc*Np, HD] x [Np, HD]^T dots (same total
    FLOPs); bounded by the Qs scratch.  Default h (one dot per side);
    DISTILLCLIP_TF_HC overrides for tuning (must divide h).
    """
    import os

    env = os.environ.get("DISTILLCLIP_TF_HC")
    if env:
        # config-settable knob (perf `tf_hc`): bad values fall back rather
        # than raising at trace time (advisor r4 class)
        try:
            hc = int(env)
        except ValueError:
            hc = 0
        if hc > 0 and h % hc == 0:
            return hc
    return h


def _lane_expand(W, h, d, scale=1.0):
    """wl_lane[b, j*d+s] = scale * W[b, j]  ([h, HD] via an indicator dot)."""
    HD = h * d
    rH = jax.lax.broadcasted_iota(jnp.int32, (h, HD), 0)
    cH = jax.lax.broadcasted_iota(jnp.int32, (h, HD), 1)
    DcolT = (cH // d == rH).astype(jnp.float32)                   # [h(j), HD]
    out = jax.lax.dot_general(
        W.astype(jnp.float32), DcolT, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                        # [h(b), HD]
    return out * scale if scale != 1.0 else out


def _scores_mode() -> str:
    """'perhead' or 'scaled' score/dPm dot strategy (DISTILLCLIP_TF_SCORES).

    Padded-cycle ledger at text shapes (Np=80 -> 128 output lanes):
    * 'perhead' (default): true-FLOP K=d dots straight off lane slices —
      h x (Np * d * 128pad) ~ 8x fewer padded MACs than the colcat score
      matmul; the conv_l mix costs an explicit _mix pass and per-dot
      Mosaic overhead is the open risk.
    * 'scaled': the head weight rides on q as a lane-broadcast multiply
      and each chunk dot contracts the FULL feature dim.  MXU-shaped and
      mix-free, but the [hc*Np, HD] x [Np -> 128pad] output padding makes
      it ~1.5x MORE padded MACs than colcat at Np=80 — kept only as an
      A/B reference and for geometries where Np is lane-aligned.
    """
    import os

    return os.environ.get("DISTILLCLIP_TF_SCORES", "perhead")


def _scores_scaled(q, k, lane_w, Qs, S, h, hc, np_len, qs_base=0, s_base=0):
    """Scores via scaled-operand chunked dots: [hc*Np, HD] x [Np, HD]^T
    emits the packed [hc*Np, Np] rows directly (see _scores_mode).

    ``qs_base``/``s_base`` select this loop iteration's OWN scratch region:
    reusing one region across the per-sample (or per-chunk) loop is the
    write-after-read pattern Mosaic mis-schedules on hardware (round-4
    packed-rows find, flash_attention._rows_fwd_kernel).  Each chunk c
    also gets its own Qs region for the same reason.
    """
    CH = hc * np_len
    for c in range(h // hc):
        qb = qs_base + c * CH
        for t in range(hc):
            b = c * hc + t
            Qs[qb + t * np_len:qb + (t + 1) * np_len, :] = (
                q * lane_w[b:b + 1, :]).astype(Qs.dtype)
        S[s_base + c * CH:s_base + (c + 1) * CH, :] = jax.lax.dot_general(
            Qs[qb:qb + CH, :], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)


def _scores_perhead(q, k, S, h, d, np_len, scale=1.0, base=0):
    """True-FLOP per-head dots straight off lane slices: S[j] = q_j k_j^T.
    ``base``: this iteration's own S region (Mosaic WAR hazard, see above)."""
    for j in range(h):
        sl = slice(j * d, (j + 1) * d)
        sc = jax.lax.dot_general(
            q[:, sl], k[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dst = slice(base + j * np_len, base + (j + 1) * np_len)
        S[dst, :] = sc * scale if scale != 1.0 else sc


def _mix_mode() -> str:
    import os

    return os.environ.get("DISTILLCLIP_TF_MIX", "fma")


def _mix(W_ref, src, dst, h, np_len, transpose=False, src_base=0, dst_base=0):
    """dst[b] = sum_j W[b,j] * src[j] over head blocks (W[j,b] if transpose).

    ``src_base``/``dst_base`` select the calling loop iteration's own
    scratch regions (Mosaic WAR hazard on reused scratch, see
    _scores_scaled).

    Two lowerings:
    * 'fma' (default): h^2 aligned [Np, Np] tile scale-adds.  W is loaded
      once as a register value; the scalar coefficients are vreg extracts.
    * 'roll': h diagonal passes — dst += roll(src, -delta*Np rows) * c_delta
      where c_delta[b] = W[b, (b+delta) % h] broadcast per block via a tiny
      indicator matmul.  h passes over the FULL [HN, Np] array instead of
      h^2 over [Np, Np] tiles: same FLOPs, ~h-fold fewer instructions —
      matters at h=24 (576-statement unrolls per mix).
    """
    # f32 at load: a mixed-dtype dot against the f32 indicator lowers to a
    # fused convert+broadcast Mosaic rejects ("source and result must have
    # same element type", probed on hardware).
    W = W_ref[...].astype(jnp.float32)
    if _mix_mode() == "roll":
        HN = h * np_len
        r1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 0)
        c1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 1)
        Drow = (r1 // np_len == c1).astype(jnp.float32)       # [(b,r), b]
        rw = jax.lax.broadcasted_iota(jnp.int32, (h, h), 0)
        cw = jax.lax.broadcasted_iota(jnp.int32, (h, h), 1)
        full = src[src_base:src_base + HN, :]
        acc = None
        for delta in range(h):
            # diag-delta coefficients: c[b] = W[b, (b+delta)%h]
            # (transpose: c[b] = W[(b+delta)%h, b]) — selected by an iota
            # mask and reduced along the matching axis, no in-kernel W.T
            if not transpose:
                sel = ((cw - rw) % h == delta)
                c_small = jnp.sum(jnp.where(sel, W, 0.0), axis=1,
                                  keepdims=True)               # [h, 1]
                c_full = jax.lax.dot_general(
                    Drow, c_small, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [HN, 1]
            else:
                sel = ((rw - cw) % h == delta)
                c_small = jnp.sum(jnp.where(sel, W, 0.0), axis=0,
                                  keepdims=True)               # [1, h]
                c_full = jax.lax.dot_general(
                    Drow, c_small, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)        # [HN, 1]
            # want rolled[i] = full[(i + delta*Np) % HN]; pltpu.roll needs a
            # non-negative shift, so roll DOWN by HN - delta*Np instead
            rolled = pltpu.roll(full, (HN - delta * np_len) % HN, 0)
            term = c_full * rolled
            acc = term if acc is None else acc + term
        dst[dst_base:dst_base + HN, :] = acc
        return
    for b in range(h):
        acc = None
        for j in range(h):
            # rank-0 extract -> vector-scalar multiply: Mosaic rejects a
            # fused [1,1] -> [Np, Np] broadcast ("both sublanes and
            # lanes", probed on hardware round 5), but a true scalar
            # splat lowers fine
            wj = W[j, b] if transpose else W[b, j]
            term = wj * src[src_base + j * np_len:src_base + (j + 1) * np_len, :]
            acc = term if acc is None else acc + term
        dst[dst_base + b * np_len:dst_base + (b + 1) * np_len, :] = acc


def _fa_fwd_kernel(qkv_ref, wl_ref, ww_ref, o_ref, p_ref,
                   Qs, S, T,
                   *, scale, gb, h, hc, np_len, n, d):
    HD = h * d
    HN = h * np_len
    # kv-pad bias on lanes >= n (pad queries flow through; their grads are
    # sliced off downstream — same contract as the colcat kernel)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, np_len), 1)
    kv_bias = jnp.where(lane < n, 0.0, NEG_INF).astype(jnp.float32)
    scaled = _scores_mode() == "scaled"
    if scaled:
        # conv_l (and the softmax scale) ride on q as a lane-broadcast mul
        wl_lane = _lane_expand(wl_ref[...], h, d, scale)

    # per-iteration scratch regions (sb/qb): reusing one region across the
    # sample loop is the WAR pattern Mosaic mis-schedules on hardware
    # (round-4 packed-rows find; this kernel carried the same pattern
    # flagged-only until round 5)
    for s in range(gb):
        lo = s * np_len
        sb = s * HN
        qb = s * HN  # Qs rows per sample: (h//hc) chunks * hc*np_len = HN
        q = qkv_ref[lo:lo + np_len, 0:HD]
        k = qkv_ref[lo:lo + np_len, HD:2 * HD]
        if scaled:
            _scores_scaled(q, k, wl_lane, Qs, S, h, hc, np_len,
                           qs_base=qb, s_base=sb)                # S = mixed
        else:
            _scores_perhead(q, k, T, h, d, np_len, scale, base=sb)  # T = raw
            _mix(wl_ref, T, S, h, np_len, src_base=sb, dst_base=sb)  # S = mixed
        x = S[sb:sb + HN, :] + kv_bias
        m = jnp.max(x, axis=-1, keepdims=True)
        e = jnp.exp(x - m)
        den = jnp.sum(e, axis=-1, keepdims=True)
        S[sb:sb + HN, :] = e / den                       # S = P' (probs)
        p_ref[s * HN:(s + 1) * HN, :] = S[sb:sb + HN, :].astype(p_ref.dtype)
        _mix(ww_ref, S, T, h, np_len, src_base=sb, dst_base=sb)  # T = Pm
        for j in range(h):
            blk = slice(sb + j * np_len, sb + (j + 1) * np_len)
            o_ref[lo:lo + np_len, j * d:(j + 1) * d] = jax.lax.dot_general(
                T[blk, :].astype(jnp.bfloat16),
                qkv_ref[lo:lo + np_len, 2 * HD + j * d:2 * HD + (j + 1) * d],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


def _fa_bwd_kernel(qkv_ref, wl_ref, ww_ref, do_ref, p_ref,
                   dqkv_ref, dwl_ref, dwwT_ref,
                   Qs, S, A, B2, Wl_s, Ww_s,
                   *, scale, gb, h, hc, np_len, n, d):
    """Emits dwl and dww^T (the host transposes dww — a [h,h] no-op there).

    Raw per-head scores (for dwl) and dPm both use the scaled-operand
    chunked dots (_scores_scaled) with an identity lane mask — no q/k/v/do
    packing anywhere; all per-head operands are direct lane slices.

    Column assembly: for each fixed g, ``sum(dPm_g . P'_j)`` over all j is
    one repeat + lane-reduce + indicator matmul producing the [h,1] column
    dww[g, :]^T, stored into Ww_s[:, g]; likewise dwl columns.
    """
    HD = h * d
    HN = h * np_len
    # Drow[(j,r), b] = 1 if j == b  (column assembly for dwl/dww)
    r1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 1)
    Drow = (r1 // np_len == c1).astype(jnp.bfloat16)
    # identity lane mask [h, HD]: block-b lanes of head b
    scaled = _scores_mode() == "scaled"
    if scaled:
        rH = jax.lax.broadcasted_iota(jnp.int32, (h, HD), 0)
        cH = jax.lax.broadcasted_iota(jnp.int32, (h, HD), 1)
        mask_lane = (cH // d == rH).astype(jnp.float32)
        id_lane = mask_lane * scale

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dwl_ref[...] = jnp.zeros_like(dwl_ref)
        dwwT_ref[...] = jnp.zeros_like(dwwT_ref)

    Wl_s[...] = jnp.zeros_like(Wl_s)
    Ww_s[...] = jnp.zeros_like(Ww_s)

    # per-iteration scratch regions (sb/qb) for Qs/S/A/B2 remove the
    # LOOP-CARRIED WAR pattern Mosaic mis-schedules on hardware (round-4
    # packed-rows find: iteration s+1's stores landing before iteration
    # s's reads).  Wl_s / Ww_s stay shared (true RMW dependence).  NOTE:
    # WITHIN one iteration A/B2 (and Qs in scaled mode) are still
    # written-after-read in sequence — that straight-line reuse is
    # certified on hardware by `hw_oracle --only factored` across both
    # geometries and all modes; if an uncovered shape misbehaves, split
    # those uses into distinct regions too (costs ~3 more [gb*HN, Np]
    # buffers).
    for s in range(gb):
        lo = s * np_len
        sb = s * HN
        qb = s * HN
        q = qkv_ref[lo:lo + np_len, 0:HD]
        k = qkv_ref[lo:lo + np_len, HD:2 * HD]
        v = qkv_ref[lo:lo + np_len, 2 * HD:3 * HD]
        do = do_ref[lo:lo + np_len, :]
        # recompute raw per-head scores (needed for dwl only; cheaper than
        # a second [HN, Np] save+reload round trip through HBM)
        if scaled:
            _scores_scaled(q, k, id_lane, Qs, S, h, hc, np_len,
                           qs_base=qb, s_base=sb)
        else:
            _scores_perhead(q, k, S, h, d, np_len, scale, base=sb)

        pp = p_ref[s * HN:(s + 1) * HN, :].astype(jnp.float32)  # P' saved

        # dPm_g = do_g v_g^T
        if scaled:
            _scores_scaled(do, v, mask_lane, Qs, A, h, hc, np_len,
                           qs_base=qb, s_base=sb)
        else:
            _scores_perhead(do, v, A, h, d, np_len, base=sb)
        # dv_j = Pm_j^T do_j ; Pm recomputed from saved P' (tile FMAs)
        _mix(ww_ref, pp, B2, h, np_len, dst_base=sb)
        for j in range(h):
            blk = slice(sb + j * np_len, sb + (j + 1) * np_len)
            dqkv_ref[lo:lo + np_len, 2 * HD + j * d:2 * HD + (j + 1) * d] = (
                jax.lax.dot_general(
                    B2[blk, :].astype(jnp.bfloat16),
                    do_ref[lo:lo + np_len, j * d:(j + 1) * d],
                    (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ).astype(dqkv_ref.dtype)
            )
        # dww[g, j] = sum dPm_g . P'_j -> column g of dww^T
        for g in range(h):
            t = pp * pltpu.repeat(A[sb + g * np_len:sb + (g + 1) * np_len, :], h, 0)
            r = jnp.sum(t, axis=-1, keepdims=True).astype(jnp.bfloat16)  # [HN,1]
            col = jax.lax.dot_general(
                Drow, r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)                      # [h,1]
            Ww_s[:, g:g + 1] = Ww_s[:, g:g + 1] + col

        # dP'_b = sum_g ww[g, b] * dPm_g   (transpose mix)
        _mix(ww_ref, A, B2, h, np_len, transpose=True, src_base=sb, dst_base=sb)
        # softmax bwd rows: dS'_b = P' . (dP' - rowsum(P'.dP'))
        pdp = pp * B2[sb:sb + HN, :]
        rs = jnp.sum(pdp, axis=-1, keepdims=True)
        A[sb:sb + HN, :] = pp * (B2[sb:sb + HN, :] - rs)  # A = dS'
        # dwl[b, j] = sum dS'_b . S_j -> column j of dwl
        for j in range(h):
            t = A[sb:sb + HN, :] * pltpu.repeat(
                S[sb + j * np_len:sb + (j + 1) * np_len, :], h, 0)
            r = jnp.sum(t, axis=-1, keepdims=True).astype(jnp.bfloat16)
            col = jax.lax.dot_general(
                Drow, r, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [h, 1]
            Wl_s[:, j:j + 1] = Wl_s[:, j:j + 1] + col
        # dS_j = sum_b wl[b, j] * dS'_b   (transpose mix), * scale
        _mix(wl_ref, A, B2, h, np_len, transpose=True, src_base=sb, dst_base=sb)
        for j in range(h):
            blk = slice(sb + j * np_len, sb + (j + 1) * np_len)
            ds_b = (B2[blk, :] * scale).astype(jnp.bfloat16)
            dqkv_ref[lo:lo + np_len, j * d:(j + 1) * d] = jax.lax.dot_general(
                ds_b, qkv_ref[lo:lo + np_len, HD + j * d:HD + (j + 1) * d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
            dqkv_ref[lo:lo + np_len, HD + j * d:HD + (j + 1) * d] = (
                jax.lax.dot_general(
                    ds_b, qkv_ref[lo:lo + np_len, j * d:(j + 1) * d],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dqkv_ref.dtype)
            )

    dwl_ref[...] += Wl_s[...]
    dwwT_ref[...] += Ww_s[...]


def _fa_fwd_call(qkv2, wl, ww, scale, n, gb, np_len, h, d, save_p):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    HN = h * np_len
    hc = _pick_hc(h, np_len)
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((gb * HN, np_len), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fa_fwd_kernel, scale=scale, gb=gb, h=h, hc=hc,
                          np_len=np_len, n=n, d=d),
        grid=(rows_total // rows_blk,),
        in_specs=[blk3, w_blk, w_blk],
        out_specs=(blk, p_blk),
        out_shape=(
            jax.ShapeDtypeStruct((rows_total, HD), qkv2.dtype),
            jax.ShapeDtypeStruct((rows_total * h, np_len), jnp.bfloat16),
        ),
        scratch_shapes=[
            # per-(sample, chunk) regions — see the WAR-hazard notes in the
            # kernel bodies; (h//hc) chunks * hc*np_len rows = HN per sample
            pltpu.VMEM((gb * HN, HD), jnp.bfloat16),       # Qs (scaled q)
            pltpu.VMEM((gb * HN, np_len), jnp.float32),    # S
            pltpu.VMEM((gb * HN, np_len), jnp.float32),    # T
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv2, wl, ww)
    return out if save_p else out[0]


def _fa_bwd_call(qkv2, wl, ww, do2, p2, scale, n, gb, np_len, h, d):
    rows_total, HD3 = qkv2.shape
    HD = HD3 // 3
    HN = h * np_len
    hc = _pick_hc(h, np_len)
    rows_blk = gb * np_len
    blk3 = pl.BlockSpec((rows_blk, HD3), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    p_blk = pl.BlockSpec((gb * HN, np_len), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dqkv, dwl, dwwT = pl.pallas_call(
        functools.partial(_fa_bwd_kernel, scale=scale, gb=gb, h=h, hc=hc,
                          np_len=np_len, n=n, d=d),
        grid=(rows_total // rows_blk,),
        in_specs=[blk3, w_blk, w_blk, blk, p_blk],
        out_specs=[blk3, w_blk, w_blk],
        out_shape=[
            jax.ShapeDtypeStruct((rows_total, HD3), qkv2.dtype),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
            jax.ShapeDtypeStruct((h, h), jnp.float32),
        ],
        scratch_shapes=[
            # per-iteration regions (WAR hazard); Wl_s/Ww_s are shared
            # accumulators (true RMW dependence, safe)
            pltpu.VMEM((gb * HN, HD), jnp.bfloat16),       # Qs (scaled ops)
            pltpu.VMEM((gb * HN, np_len), jnp.float32),    # S (raw scores)
            pltpu.VMEM((gb * HN, np_len), jnp.float32),    # A (dPm / dS')
            pltpu.VMEM((gb * HN, np_len), jnp.float32),    # B2 (Pm / dP' / dS)
            pltpu.VMEM((h, h), jnp.float32),               # Wl_s
            pltpu.VMEM((h, h), jnp.float32),               # Ww_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(qkv2, wl, ww, do2, p2)
    return dqkv, dwl, dwwT.T


def _pick_gb(B: int, cap: int = 8) -> int:
    import os

    env = os.environ.get("DISTILLCLIP_TF_FA_GB")
    if env:
        # perf `tf_fa_gb`: fall back on bad values (advisor r4 class)
        try:
            gb = int(env)
        except ValueError:
            gb = 0
        if gb > 0 and B % gb == 0:
            return gb
    for g in (cap, 4, 2):
        if B % g == 0:
            return g
    return 1


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def tf_factored_qkv(qkvf, wl, ww, scale, n, heads, np_len):
    rows_total, HD3 = qkvf.shape
    d = HD3 // 3 // heads
    gb = _pick_gb(rows_total // np_len)
    return _fa_fwd_call(qkvf, wl, ww, float(scale), n, gb, np_len, heads, d,
                        save_p=False)


def _tf_factored_fwd(qkvf, wl, ww, scale, n, heads, np_len):
    rows_total, HD3 = qkvf.shape
    d = HD3 // 3 // heads
    gb = _pick_gb(rows_total // np_len)
    of, pf = _fa_fwd_call(qkvf, wl, ww, float(scale), n, gb, np_len, heads, d,
                          save_p=True)
    return of, (qkvf, wl, ww, pf)


def _tf_factored_bwd(scale, n, heads, np_len, res, do):
    qkvf, wl, ww, pf = res
    rows_total, HD3 = qkvf.shape
    d = HD3 // 3 // heads
    gb = _pick_gb(rows_total // np_len)
    dqkv, dwl, dww = _fa_bwd_call(qkvf, wl, ww, do, pf, float(scale), n, gb,
                                  np_len, heads, d)
    return dqkv, dwl.astype(wl.dtype), dww.astype(ww.dtype)


tf_factored_qkv.defvjp(_tf_factored_fwd, _tf_factored_bwd)

# Round 5: the round-4-flagged LOOP-CARRIED scratch-reuse WAR hazard is
# FIXED — every per-sample loop iteration (and every scaled-mode chunk)
# owns its scratch region across iterations, mirroring the packed-rows fix
# (flash_attention._rows_fwd_kernel).  Intra-iteration sequential reuse of
# A/B2/Qs remains (see the bwd kernel note) and is certified on hardware
# via tools/hw_oracle.py --only factored (all modes, both geometries).
