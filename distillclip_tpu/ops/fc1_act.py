"""Fused fc1 + activation forward kernel (Pallas/TPU).

Why: in 2D rows mode the MLP's first dense is the largest single op family
in the student steps — e.g. 4 x 4.49 ms of the 153 ms cached text step —
and XLA runs it at only 45% MFU / 253 GB/s (device trace, BENCH_NOTES
round 3).  The op is structurally write-heavy: the forward must emit BOTH
the pre-activation u = x@W + b and the activation's transcendental value
e (erf or sigmoid) as backward residuals, ~1 GB per layer at text scale
(the activation h itself is recombined from (u, e) by the fc2 fusion's
operand read, so it is never materialized).  That write traffic is
inherent; XLA's 45% MFU on top of it is not.

The kernel computes u in one MXU dot per row block (K = C fits VMEM whole,
no K loop) and writes (u, e).  The surrounding graph is unchanged from
what XLA builds today: h = recombine(u, e) fuses into the fc2 matmul
read, and the backward reads (u, e) in its du/db pass — so this swaps in
at exactly one HLO and the autodiff structure stays identical via a
custom VJP whose backward is plain XLA (dW/dx matmuls already run at
56-96% MFU).

Negative results that motivated this design (measured, BENCH_NOTES):
jax.checkpoint on the activation (save u only) makes the step SLOWER —
the bf16 erf recompute becomes its own [rows, 4C] backward pass (+1.4
ms/layer) while the forward still writes two outputs.

Reference parity: timm-style Mlp fc1+GELU(exact)
(weight_share_model.py:142-152) and CLIP c_fc+QuickGELU
(_common.py:104-108).
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from distillclip_tpu.ops._shard import shard_rows_call

Array = jax.Array

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _erf_approx(z):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf primitive (NotImplementedError: KernelType.TC: erf);
    this rational+exp form uses only supported ops, and 1.5e-7 is far below
    the bf16 ulp the value is stored at."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    p = 0.3275911
    s = jnp.sign(z)
    x = jnp.abs(z)
    t = 1.0 / (1.0 + p * x)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-x * x))


def _fc1_kernel(x_ref, w_ref, b_ref, u_ref, e_ref, *, act):
    x = x_ref[...]
    w = w_ref[...]
    u = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    if act == "gelu_exact":
        e = _erf_approx(u * _INV_SQRT2)
    elif act == "quick_gelu":
        e = jax.nn.sigmoid(1.702 * u)
    else:  # pragma: no cover
        raise ValueError(act)
    u_ref[...] = u.astype(u_ref.dtype)
    e_ref[...] = e.astype(e_ref.dtype)


def _pick_rows_blk(rows: int) -> int:
    import os

    env = os.environ.get("DISTILLCLIP_FC1_BLK")
    if env:
        # block-size override for hardware tuning (perf `fc1_blk`);
        # bad values fall back rather than raising at trace time
        try:
            blk = int(env)
        except ValueError:
            blk = 0
        if blk > 0 and rows % blk == 0:
            return blk
    for cand in (512, 256, 128, 64, 32, 16, 8):
        if rows % cand == 0:
            return cand
    return rows


def _res_mode() -> str:
    """Backward-residual mode: 'ue' (default) stores the kernel-computed
    erf/sigmoid value alongside the pre-activation; 'u' stores only the
    pre-activation and recomputes the transcendental in the XLA consumers.

    'u' halves the fc1 kernel's output writes AND the (u, e) re-reads of the
    fc2 operand fusion and the backward du fusion.  MEASURED NEGATIVE
    (fenced, v5e-1, cached text B=1024 full step): 121.4 ms vs 116.5 default
    — the modeled bytes do drop (32.0 -> 28.1 GB/step) but the XLA erf
    recompute serializes inside the MXU-bound consumer fusions and costs
    more than the bandwidth saved.  Kept as an A/B reference; distinct from
    the also-negative jax.checkpoint variant (module docstring), which
    additionally re-runs the elementwise tail as its own [rows, 4C] pass."""
    import os

    return os.environ.get("DISTILLCLIP_FC1_RES", "ue")


def _act_e(uf, act):
    """The activation's transcendental value e from f32 u, in XLA (u mode)."""
    if act == "gelu_exact":
        return jax.lax.erf(uf * _INV_SQRT2)
    return jax.nn.sigmoid(1.702 * uf)  # quick_gelu


def _fc1_u_kernel(x_ref, w_ref, b_ref, u_ref):
    u = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    u_ref[...] = u.astype(u_ref.dtype)


def _fc1_u_call(x, w, b):
    rows, C = x.shape
    H = w.shape[1]
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fc1_u_kernel,
        grid=(rows // blk_rows,),
        in_specs=[xblk, wblk, bblk],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((rows, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, w, b.reshape(1, H))


def _fc1_call(x, w, b, act):
    rows, C = x.shape
    H = w.shape[1]
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fc1_kernel, act=act),
        grid=(rows // blk_rows,),
        in_specs=[xblk, wblk, bblk],
        out_specs=(oblk, oblk),
        out_shape=(
            jax.ShapeDtypeStruct((rows, H), x.dtype),
            jax.ShapeDtypeStruct((rows, H), x.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            # W is grid-resident ([C, 4C] bf16 ~4.7 MB at C=768) + the f32
            # accumulator block; default 16MB scoped budget is too tight
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, w, b.reshape(1, H))


def _recombine(u, e, act):
    uf = u.astype(jnp.float32)
    ef = e.astype(jnp.float32)
    if act == "gelu_exact":
        h = 0.5 * uf * (1.0 + ef)
    else:  # quick_gelu
        h = uf * ef
    return h.astype(u.dtype)


def _recombine_u(u, act):
    """h from u alone (u residual mode): one XLA transcendental, fused."""
    uf = u.astype(jnp.float32)
    ef = _act_e(uf, act)
    if act == "gelu_exact":
        h = 0.5 * uf * (1.0 + ef)
    else:  # quick_gelu
        h = uf * ef
    return h.astype(u.dtype)


def _fc1_h_kernel(x_ref, w_ref, b_ref, h_ref, *, act):
    """Lean fc1+act forward emitting h ONLY — used by the custom_vjp
    primal, so no-grad contexts (validation / serving encoders) skip the
    (u, e) residual writes."""
    u = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    if act == "gelu_exact":
        h = 0.5 * u * (1.0 + _erf_approx(u * _INV_SQRT2))
    elif act == "quick_gelu":
        h = u * jax.nn.sigmoid(1.702 * u)
    else:  # pragma: no cover
        raise ValueError(act)
    h_ref[...] = h.astype(h_ref.dtype)


def _fc1_h_call(x, w, b, act):
    rows, C = x.shape
    H = w.shape[1]
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fc1_h_kernel, act=act),
        grid=(rows // blk_rows,),
        in_specs=[xblk, wblk, bblk],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((rows, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, w, b.reshape(1, H))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _dense_act(x: Array, w: Array, b: Array, act: str) -> Array:
    # primal (no-grad contexts): lean kernel, h only
    return _fc1_h_call(x, w, b, act)


def _dense_act_fwd(x, w, b, act):
    if _res_mode() == "u":
        # u-only residual: e recomputed from u (XLA erf/sigmoid) in the fc2
        # operand fusion here and in the du fusion of the backward
        u = _fc1_u_call(x, w, b)
        h = _recombine_u(u, act)
        return h, (x, w, u, None)
    u, e = _fc1_call(x, w, b, act)
    # h is NOT a residual: consumers recombine it from (u, e) — XLA fuses
    # the multiply into the next matmul's operand read (same graph shape
    # XLA itself builds for dense->gelu->dense)
    return _recombine(u, e, act), (x, w, u, e)


def _dense_act_bwd(act, res, dh):
    x, w, u, e = res
    uf = u.astype(jnp.float32)
    ef = _act_e(uf, act) if e is None else e.astype(jnp.float32)
    if act == "gelu_exact":
        # gelu'(u) = Phi(u) + u phi(u); Phi from the saved erf value, phi
        # is a cheap exp (vs the erf recompute that made remat lose)
        gp = 0.5 * (1.0 + ef) + uf * jnp.exp(-0.5 * uf * uf) * _INV_SQRT2PI
    else:  # quick_gelu: h = u*s, s' = 1.702 s (1-s)
        gp = ef + 1.702 * uf * ef * (1.0 - ef)
    du = (dh.astype(jnp.float32) * gp).astype(dh.dtype)
    dx = jax.lax.dot_general(
        du, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    dw = jax.lax.dot_general(
        x, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(du.astype(jnp.float32), axis=0).astype(w.dtype)
    return dx, dw, db


_dense_act.defvjp(_dense_act_fwd, _dense_act_bwd)


def dense_act(x: Array, w: Array, b: Array, act: str = "gelu_exact") -> Array:
    """h = act(x @ w + b) with the fused Pallas forward; 2D rows only.

    Under an active device mesh the kernel runs per-shard via shard_map
    (ops/_shard.py) — row-sharded x, replicated w/b, dw/db psum'd by the
    shard_map transpose.  Rows here are [B*seq, C]; any row split is
    valid for this op, so ``samples`` is the row count itself.
    """
    return shard_rows_call(
        lambda xs, ws, bs: _dense_act(xs, ws, bs, act),
        (x,), (w, b), x.shape[0],
    )


# ---------------------------------------------------------------------------
# LN + fc1 + activation: the MLP's LayerNorm folded into the fc1 kernel
# ---------------------------------------------------------------------------

def _fc1_ln_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref,
                   u_ref, e_ref, m_ref, r_ref, *, act, eps):
    """LN prologue fused into the fc1 matmul (norm2 feeds ONLY fc1).

    Saves the separate LN kernel's full [rows, C] write + re-read — LN is
    per-row over C, so the moments are local to the row block.  Emits
    (mean, rstd) as backward residuals; the backward recombines xhat from
    (x, mean, rstd) inside its dW operand read (plain XLA).
    """
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (x - mean) * rstd * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    u = jax.lax.dot_general(
        xn.astype(x_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    if act == "gelu_exact":
        e = _erf_approx(u * _INV_SQRT2)
    elif act == "quick_gelu":
        e = jax.nn.sigmoid(1.702 * u)
    else:  # pragma: no cover
        raise ValueError(act)
    u_ref[...] = u.astype(u_ref.dtype)
    e_ref[...] = e.astype(e_ref.dtype)
    m_ref[...] = mean
    r_ref[...] = rstd


def _fc1_ln_call(x, ls, lb, w, b, act, eps):
    rows, C = x.shape
    H = w.shape[1]
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vblk = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((blk_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fc1_ln_kernel, act=act, eps=eps),
        grid=(rows // blk_rows,),
        in_specs=[xblk, vblk, vblk, wblk, bblk],
        out_specs=(oblk, oblk, sblk, sblk),
        out_shape=(
            jax.ShapeDtypeStruct((rows, H), x.dtype),
            jax.ShapeDtypeStruct((rows, H), x.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, ls.reshape(1, C), lb.reshape(1, C), w, b.reshape(1, H))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _dense_act_ln(x, ls, lb, w, b, act, eps):
    # primal (no-grad contexts, e.g. frozen teacher towers): lean kernel,
    # h only — the (u, e) residuals are written only under differentiation
    return _fc1_ln_h_call(x, ls, lb, w, b, act, eps)


def _dense_act_ln_fwd(x, ls, lb, w, b, act, eps):
    if _res_mode() == "u":
        # u-only residual: the LN+dense kernel already exists (_dense_ln_call
        # emits u, mean, rstd); e is recomputed from u in the XLA consumers
        u, mean, rstd = _dense_ln_call(x, ls, lb, w, b, eps)
        return _recombine_u(u, act), (x, ls, lb, w, u, None, mean, rstd)
    u, e, mean, rstd = _fc1_ln_call(x, ls, lb, w, b, act, eps)
    return _recombine(u, e, act), (x, ls, lb, w, u, e, mean, rstd)


def _dense_act_ln_bwd(act, eps, res, dh):
    x, ls, lb, w, u, e, mean, rstd = res
    uf = u.astype(jnp.float32)
    ef = _act_e(uf, act) if e is None else e.astype(jnp.float32)
    if act == "gelu_exact":
        gp = 0.5 * (1.0 + ef) + uf * jnp.exp(-0.5 * uf * uf) * _INV_SQRT2PI
    else:  # quick_gelu
        gp = ef + 1.702 * uf * ef * (1.0 - ef)
    du = (dh.astype(jnp.float32) * gp).astype(dh.dtype)
    dx, xn, dls, dlb = _dln_bwd_call(x, ls, lb, w, du, mean, rstd)
    dw = jax.lax.dot_general(
        xn, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = jnp.sum(du.astype(jnp.float32), axis=0).astype(w.dtype)
    return dx, dls.astype(ls.dtype), dlb.astype(lb.dtype), dw, db


_dense_act_ln.defvjp(_dense_act_ln_fwd, _dense_act_ln_bwd)


def dense_act_ln(x: Array, ls: Array, lb: Array, w: Array, b: Array,
                 act: str = "gelu_exact", eps: float = 1e-5) -> Array:
    """h = act(LN(x; ls, lb) @ w + b), LN fused into the fc1 kernel.

    Same sharding contract as :func:`dense_act` (any row split is valid).
    """
    return shard_rows_call(
        lambda xs, lss, lbs, ws, bs: _dense_act_ln(xs, lss, lbs, ws, bs, act,
                                                   float(eps)),
        (x,), (ls, lb, w, b), x.shape[0],
    )


# ---------------------------------------------------------------------------
# LN + plain dense: norm1 folded into the qkv projection
# ---------------------------------------------------------------------------

def _dense_ln_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref,
                     u_ref, m_ref, r_ref, *, eps, has_bias):
    """LN prologue fused into a plain dense (the attention qkv projection).

    norm1 feeds only the qkv dense, whose output already crosses a custom-
    call boundary (the attention kernel) — XLA materializes it regardless,
    so the fusion saves exactly the standalone LN kernel's [rows, C]
    write + re-read.
    """
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (x - mean) * rstd * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    u = jax.lax.dot_general(
        xn.astype(x_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        u = u + b_ref[...].astype(jnp.float32)
    u_ref[...] = u.astype(u_ref.dtype)
    m_ref[...] = mean
    r_ref[...] = rstd


def _dense_ln_call(x, ls, lb, w, b, eps):
    rows, C = x.shape
    H = w.shape[1]
    has_bias = b is not None
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vblk = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((blk_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    args = [x, ls.reshape(1, C), lb.reshape(1, C), w]
    in_specs = [xblk, vblk, vblk, wblk]
    if has_bias:
        args.append(b.reshape(1, H))
        in_specs.append(bblk)
    else:
        args.append(jnp.zeros((1, 1), x.dtype))  # placeholder operand
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM))
    return pl.pallas_call(
        functools.partial(_dense_ln_kernel, eps=eps, has_bias=has_bias),
        grid=(rows // blk_rows,),
        in_specs=in_specs,
        out_specs=(oblk, sblk, sblk),
        out_shape=(
            jax.ShapeDtypeStruct((rows, H), x.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dense_ln(x, ls, lb, w, b, eps):
    u, _, _ = _dense_ln_call(x, ls, lb, w, b, eps)
    return u


def _dense_ln_fwd(x, ls, lb, w, b, eps):
    u, mean, rstd = _dense_ln_call(x, ls, lb, w, b, eps)
    return u, (x, ls, lb, w, b, mean, rstd)


def _dense_ln_bwd(eps, res, du):
    x, ls, lb, w, b, mean, rstd = res
    dx, xn, dls, dlb = _dln_bwd_call(x, ls, lb, w, du, mean, rstd)
    dw = jax.lax.dot_general(
        xn, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(w.dtype)
    db = (jnp.sum(du.astype(jnp.float32), axis=0).astype(w.dtype)
          if b is not None else None)
    return dx, dls.astype(ls.dtype), dlb.astype(lb.dtype), dw, db


_dense_ln.defvjp(_dense_ln_fwd, _dense_ln_bwd)


def dense_ln(x: Array, ls: Array, lb: Array, w: Array, b=None,
             eps: float = 1e-5) -> Array:
    """u = LN(x; ls, lb) @ w (+ b), LN fused into the dense kernel."""
    if b is None:
        return shard_rows_call(
            lambda xs, lss, lbs, ws: _dense_ln(xs, lss, lbs, ws, None,
                                               float(eps)),
            (x,), (ls, lb, w), x.shape[0],
        )
    return shard_rows_call(
        lambda xs, lss, lbs, ws, bs: _dense_ln(xs, lss, lbs, ws, bs,
                                               float(eps)),
        (x,), (ls, lb, w, b), x.shape[0],
    )


def _fc1_ln_h_kernel(x_ref, ls_ref, lb_ref, w_ref, b_ref, h_ref, *, act, eps):
    """Lean LN+fc1+act forward emitting h ONLY (no backward residuals).

    Used by the custom_vjp PRIMAL: in no-grad contexts (the frozen teacher
    towers) JAX runs the primal, so the (u, e) residual writes — ~2x the
    output bytes — are skipped entirely.
    """
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xn = (x - mean) * rstd * ls_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    u = jax.lax.dot_general(
        xn.astype(x_ref.dtype), w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b_ref[...].astype(jnp.float32)
    if act == "gelu_exact":
        h = 0.5 * u * (1.0 + _erf_approx(u * _INV_SQRT2))
    elif act == "quick_gelu":
        h = u * jax.nn.sigmoid(1.702 * u)
    else:  # pragma: no cover
        raise ValueError(act)
    h_ref[...] = h.astype(h_ref.dtype)


def _fc1_ln_h_call(x, ls, lb, w, b, act, eps):
    rows, C = x.shape
    H = w.shape[1]
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vblk = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((C, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    bblk = pl.BlockSpec((1, H), lambda i: (0, 0), memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fc1_ln_h_kernel, act=act, eps=eps),
        grid=(rows // blk_rows,),
        in_specs=[xblk, vblk, vblk, wblk, bblk],
        out_specs=oblk,
        out_shape=jax.ShapeDtypeStruct((rows, H), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, ls.reshape(1, C), lb.reshape(1, C), w, b.reshape(1, H))

# ---------------------------------------------------------------------------
# Fused LN-backward kernel shared by the dense_ln / dense_act_ln VJPs
# ---------------------------------------------------------------------------

def _dln_bwd_kernel(x_ref, ls_ref, lb_ref, wt_ref, du_ref, mean_ref, rstd_ref,
                    dx_ref, xn_ref, dls_ref, dlb_ref):
    """dx/xn/dls/dlb of u = LN(x) @ w in one pass, dxn never leaving VMEM.

    The XLA formulation of this backward materializes the f32 [rows, C]
    dxn = du @ w^T in HBM and re-reads it for the dls/dlb reduces, the two
    per-row moments, and the dx combine (~250 MB x 3 round trips per layer
    at text scale — the `multiply_reduce_fusion` family in the device
    trace).  Here the dot runs per row block on the MXU and every f32
    intermediate dies in VMEM; the only HBM traffic is the bf16 operands
    and the bf16 dx/xn outputs.  xn is emitted for the external dW matmul
    (dw = xn^T @ du), which XLA already runs at 56-96% MFU.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        dls_ref[...] = jnp.zeros_like(dls_ref)
        dlb_ref[...] = jnp.zeros_like(dlb_ref)

    c = x_ref.shape[-1]
    ls = ls_ref[...].astype(jnp.float32)
    xhat = (x_ref[...].astype(jnp.float32) - mean_ref[...]) * rstd_ref[...]
    xn = xhat * ls + lb_ref[...].astype(jnp.float32)
    xn_ref[...] = xn.astype(xn_ref.dtype)
    dxn = jax.lax.dot_general(
        du_ref[...], wt_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dls_ref[...] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlb_ref[...] += jnp.sum(dxn, axis=0, keepdims=True)
    dxhat = dxn * ls
    m1 = jnp.sum(dxhat, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(dxhat * xhat, axis=-1, keepdims=True) * (1.0 / c)
    dx_ref[...] = (rstd_ref[...] * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


def _dln_bwd_call(x, ls, lb, w, du, mean, rstd):
    """Returns (dx, xn, dls, dlb); dls/dlb f32 [C]."""
    rows, C = x.shape
    H = w.shape[1]
    wt = jnp.transpose(w)  # [H, C]; ~5 MB bf16 once per layer, grid-resident
    blk_rows = _pick_rows_blk(rows)
    xblk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vblk = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((H, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ublk = pl.BlockSpec((blk_rows, H), lambda i: (i, 0), memory_space=pltpu.VMEM)
    sblk = pl.BlockSpec((blk_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dx, xn, dls, dlb = pl.pallas_call(
        _dln_bwd_kernel,
        grid=(rows // blk_rows,),
        in_specs=[xblk, vblk, vblk, wblk, ublk, sblk, sblk],
        out_specs=(xblk, xblk, vblk, vblk),
        out_shape=(
            jax.ShapeDtypeStruct((rows, C), x.dtype),
            jax.ShapeDtypeStruct((rows, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, ls.reshape(1, C), lb.reshape(1, C), wt, du, mean, rstd)
    return dx, xn, dls.reshape(C), dlb.reshape(C)
