"""Fused head-transform attention (colcat formulation) — forward kernel.

The weight-share student's attention applies [H, H] cross-head mixes to the
logits (conv_l, pre-softmax) and probs (conv_w, post-softmax)
(reference weight_share_model.py:114-121), which defeats per-head fusion.
This kernel keeps everything 2D so Mosaic can lower it:

* per-head scores are written into a COLCAT scratch [Np, H*Np]
  (scratch stores relayout lane offsets; concat does not),
* the head mixes become single 2D matmuls against kron(W^T, I_Np)
  matrices built in-register from pltpu.repeat + iota,
* block softmax: global-row max (safe upper bound), f32 exp, per-block
  denominators via a [H*Np, H] block-indicator matmul, broadcast back with
  pltpu.repeat,
* the output contraction uses a block-diagonal V scratch so ONE
  [Np, H*Np] @ [H*Np, H*d] matmul emits the natural lane-dense layout.

Forward only: the backward runs the (bf16-buffered) XLA recompute path via
custom_vjp.  The backward admits the same colcat structure (all mixes are
matmuls against the transposed kron constants) — planned follow-up.

Status (measured on v5e, B=128/H=24/Np=64/d=32): compiles, matches the XLA
oracle to bf16 rounding (4e-3), but the kron mixes inflate head-mix FLOPs
by ~Np x (identity-block zeros ride the MXU) and the 6-layer forward runs
6.56 ms vs 4.93 ms for XLA — so this kernel is NOT wired into the model
paths yet.  See BENCH_NOTES.md "Next levers" for the j-batched rank-3 mix
reformulation that removes the inflation.
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
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _tf_colcat_kernel(q_ref, k_ref, v_ref, wl_ref, ww_ref, o_ref,
                      colcat, vbd, *, scale, gb, h, np_len, n, d):
    HN = h * np_len
    # [HN,1] vs [1,HN] broadcast-compare: full [HN,HN] i32 iotas would cost
    # ~2*HN^2*4 bytes of scoped VMEM (19MB at H=24,Np=64) and OOM the kernel
    row = jax.lax.broadcasted_iota(jnp.int32, (HN, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, HN), 1)
    eye_blk = (row % np_len == col % np_len).astype(jnp.bfloat16)

    # block-indicator [HN, H]: D[g*Np + j, h] = (g == h)
    r2 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 0)
    c2 = jax.lax.broadcasted_iota(jnp.int32, (HN, h), 1)
    Dsmall = (r2 // np_len == c2).astype(jnp.bfloat16)

    def kron_t(w_ref):
        # K[r, c] = W[c//Np, r//Np] * (r%Np == c%Np), built by indicator
        # matmuls (pltpu.repeat TILES rather than block-repeats)
        wt = jnp.transpose(w_ref[...].astype(jnp.bfloat16))  # [H, H]
        tmp = jax.lax.dot_general(
            wt, Dsmall, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)  # [H, HN]: tmp[g, c] = wt[g, c//Np]
        big = jax.lax.dot_general(
            Dsmall, tmp, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)  # [HN, HN]: big[r, c] = wt[r//Np, c//Np]
        return big * eye_blk

    Ml = kron_t(wl_ref)
    Mw = kron_t(ww_ref)

    # kv-pad mask on colcat lanes ([1,HN]; broadcasts over the row dim)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, HN), 1)
    kv_bias = jnp.where((ccol % np_len) < n, 0.0, NEG_INF).astype(jnp.float32)

    for s in range(gb):
        lo = s * np_len
        # 1) per-head scores into colcat [Np, H*Np]
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            q_h = q_ref[lo:lo + np_len, sl]
            k_h = k_ref[lo:lo + np_len, sl]
            s_h = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            colcat[:, i * np_len:(i + 1) * np_len] = s_h
        # 2) conv_l mix (2D matmul), then pad mask
        s2 = jax.lax.dot_general(
            colcat[...].astype(jnp.bfloat16), Ml, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + kv_bias
        # 3) block softmax with global-row max
        m = jnp.max(s2, axis=-1, keepdims=True)
        e = jnp.exp(s2 - m)  # [Np, HN] f32
        denom = jax.lax.dot_general(
            e.astype(jnp.bfloat16), Dsmall, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Np, H]
        denom_full = jax.lax.dot_general(
            denom, Dsmall.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Np, HN]: denom broadcast to its head block
        # guard: with a global-row max, a head whose logits sit far below
        # another head's can underflow entirely; keep it at zero, not NaN
        p = e / jnp.maximum(denom_full, 1e-30)
        # 4) conv_w mix
        p2 = jax.lax.dot_general(
            p.astype(jnp.bfloat16), Mw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # 5) block-diagonal V; one matmul emits the natural layout
        vbd[...] = jnp.zeros_like(vbd)
        for i in range(h):
            sl = slice(i * d, (i + 1) * d)
            vbd[i * np_len:(i + 1) * np_len, sl] = v_ref[lo:lo + np_len, sl]
        o = jax.lax.dot_general(
            p2.astype(jnp.bfloat16), vbd[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[lo:lo + np_len, :] = o.astype(o_ref.dtype)


def _tf_colcat_fwd(q2, k2, v2, wl, ww, scale, n, gb, np_len, h, d):
    rows_total, HD = q2.shape
    rows_blk = gb * np_len
    blk = pl.BlockSpec((rows_blk, HD), lambda i: (i, 0), memory_space=pltpu.VMEM)
    w_blk = pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tf_colcat_kernel, scale=scale, gb=gb, h=h,
                          np_len=np_len, n=n, d=d),
        grid=(rows_total // rows_blk,),
        in_specs=[blk, blk, blk, w_blk, w_blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((rows_total, HD), q2.dtype),
        scratch_shapes=[
            pltpu.VMEM((np_len, h * np_len), jnp.float32),   # colcat
            pltpu.VMEM((h * np_len, HD), q2.dtype),          # block-diag V
        ],
        compiler_params=pltpu.CompilerParams(
            # Ml/Mw/eye_blk are [HN,HN] register-resident constants
            # (~4.7MB each at H=24,Np=64); the 16MB default is too tight
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(q2, k2, v2, wl, ww)


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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _tf_rows(q2, k2, v2, wl, ww, scale, n, heads):
    B, N, HD = q2.shape
    d = HD // heads
    gb = 1
    for cand in (4, 2, 1):
        if B % cand == 0:
            gb = cand
            break
    qf, kf, vf = (t.reshape(B * N, HD) for t in (q2, k2, v2))
    of = _tf_colcat_fwd(qf, kf, vf, wl, ww, float(scale), n, gb, N, heads, d)
    return of.reshape(B, N, HD)


def _tf_rows_fwd(q2, k2, v2, wl, ww, scale, n, heads):
    o = _tf_rows(q2, k2, v2, wl, ww, scale, n, heads)
    return o, (q2, k2, v2, wl, ww)


def _tf_rows_bwd(scale, n, heads, res, do):
    q2, k2, v2, wl, ww = res
    _, vjp = jax.vjp(
        lambda a, b, c, l, w: _xla_transform_rows(a, b, c, l, w, scale, n, heads),
        q2, k2, v2, wl, ww,
    )
    return vjp(do)


_tf_rows.defvjp(_tf_rows_fwd, _tf_rows_bwd)


def transform_attention_rows(
    q2: Array, k2: Array, v2: Array, wl: Array, ww: Array,
    *, heads: int, scale: Optional[float] = None, kv_len: Optional[int] = None,
) -> Array:
    """Fused head-transform attention on the natural [B, N, H*d] layout.

    N must be a 16-multiple (tower-level padding); ``kv_len`` masks pad keys.
    """
    B, N, HD = q2.shape
    d = HD // heads
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if N % 16 != 0:
        raise ValueError(f"transform_attention_rows requires N % 16 == 0, got {N}")
    n = kv_len if kv_len is not None else N
    return _tf_rows(q2, k2, v2, wl, ww, float(scale), int(n), int(heads))
