"""Fused LayerNorm kernel for 2D rows activations (Pallas/TPU).

Why: with the towers in 2D rows mode the matmuls run at ~80% MFU, and the
LayerNorms become a visible standalone cost — XLA lowers the fp32
mean/var reduction as `convert_reduce` fusions measured at ~60 GB/s
(0.83 ms for a 50 MB pass; device traces in BENCH_NOTES round 3), ~10 ms
of a 113 ms joint step.  A row-blocked Pallas kernel streams at HBM rate
and saves the per-row (mean, rstd) statistics for an exact backward.

Forward per block:  y = (x - mean) * rstd * scale + bias     (fp32 math)
Backward:           dx = rstd * (g*s - rowmean(g*s) - xhat * rowmean(g*s*xhat))
                    dscale = sum_rows(g * xhat);   dbias = sum_rows(g)
with xhat recomputed from x and the saved statistics.  The dscale/dbias
accumulators are kernel outputs accumulated across grid steps (init at
step 0), like the conv_l/conv_w grads in ops/transform_attention.py.

Reference semantics: fp32 LayerNorm of model/component/_common.py:14-20
(teacher) and torch-default LayerNorm (student blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    try:
        return jax.default_backend() not in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return True


def _pick_rows_blk(rows: int, cap: int = 1024) -> int:
    # fp32 temporaries are ~5x the bf16 block; 2048x768 rows blew the 16MB
    # scoped-vmem budget on hardware (20.27M) -- cap at 1024 (fwd) / 512
    # (bwd, which holds x+g+dx blocks at once) and lift the scoped limit.
    for cand in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if cand <= cap and rows % cand == 0:
            return cand
    return rows


def _ln_fwd_kernel(x_ref, s_ref, b_ref, y_ref, mean_ref, rstd_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) * (1.0 / c)
    d = x - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) * (1.0 / c)
    rstd = jax.lax.rsqrt(var + eps)
    y = d * rstd * s_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _ln_bwd_kernel(x_ref, s_ref, g_ref, mean_ref, rstd_ref,
                   dx_ref, ds_ref, db_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        ds_ref[...] = jnp.zeros_like(ds_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    x = x_ref[...].astype(jnp.float32)
    g = g_ref[...].astype(jnp.float32)
    s = s_ref[...].astype(jnp.float32)
    c = x.shape[-1]
    xhat = (x - mean_ref[...]) * rstd_ref[...]
    gs = g * s
    m1 = jnp.sum(gs, axis=-1, keepdims=True) * (1.0 / c)
    m2 = jnp.sum(gs * xhat, axis=-1, keepdims=True) * (1.0 / c)
    dx = rstd_ref[...] * (gs - m1 - xhat * m2)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    ds_ref[...] += jnp.sum(g * xhat, axis=0, keepdims=True)
    db_ref[...] += jnp.sum(g, axis=0, keepdims=True)


def _ln_fwd_call(x, s, b, eps):
    rows, C = x.shape
    blk_rows = _pick_rows_blk(rows)
    blk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((blk_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(rows // blk_rows,),
        in_specs=[blk, vec, vec],
        out_specs=(blk, stat, stat),
        out_shape=(
            jax.ShapeDtypeStruct((rows, C), x.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, s.reshape(1, C), b.reshape(1, C))


def _ln_bwd_call(x, s, g, mean, rstd):
    rows, C = x.shape
    blk_rows = _pick_rows_blk(rows, cap=512)
    blk = pl.BlockSpec((blk_rows, C), lambda i: (i, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((blk_rows, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec = pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dx, ds, db = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(rows // blk_rows,),
        in_specs=[blk, vec, blk, stat, stat],
        out_specs=(blk, vec, vec),
        out_shape=(
            jax.ShapeDtypeStruct((rows, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, s.reshape(1, C), g, mean, rstd)
    return dx, ds.reshape(C), db.reshape(C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _layer_norm_rows(x: Array, scale: Array, bias: Array, eps: float) -> Array:
    y, _, _ = _ln_fwd_call(x, scale, bias, eps)
    return y


def _ln_rows_fwd(x, scale, bias, eps):
    y, mean, rstd = _ln_fwd_call(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


def _ln_rows_bwd(eps, res, g):
    x, scale, mean, rstd = res
    dx, ds, db = _ln_bwd_call(x, scale, g, mean, rstd)
    return dx, ds.astype(scale.dtype), db.astype(scale.dtype)


_layer_norm_rows.defvjp(_ln_rows_fwd, _ln_rows_bwd)


def layer_norm_rows(x: Array, scale: Array, bias: Array, eps: float = 1e-5) -> Array:
    """Fused fp32-math LayerNorm over the last dim of 2D [rows, C] inputs.

    Under an active device mesh the kernel runs per-shard via shard_map
    (ops/_shard.py): row-sharded x, replicated scale/bias, dscale/dbias
    psum'd by the shard_map transpose.  LN is row-independent, so any
    row split is valid.
    """
    from distillclip_tpu.ops._shard import shard_rows_call

    return shard_rows_call(
        lambda xs, ss, bs: _layer_norm_rows(xs, ss, bs, eps),
        (x,), (scale, bias), x.shape[0],
    )
