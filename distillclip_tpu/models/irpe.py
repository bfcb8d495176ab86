"""Image Relative Position Encoding (iRPE) — TPU-native.

Re-design of reference model/component/_irpe.py (933 LoC).  Differences in
*mechanism*, parity in *math*:

* Bucket-ID tables are computed host-side in numpy at trace time (static
  shapes; the reference computes them lazily on device with a global cache,
  _irpe.py:283-356).  For a fixed image size they are compile-time constants.
* The contextual "gather by bucket id" — which the reference accelerates with
  an optional external CUDA op ``RPEIndexFunction`` (_irpe.py:8-11) and
  otherwise emulates with flatten+index (:574-577,639-643) — becomes a
  one-hot einsum: a dense [L, num_buckets, L] constant contracted on the MXU.
  At ViT scales (L<=257, buckets<=60) this is faster than any gather on TPU.
* Methods: product / euclidean / quant / cross; modes: bias / contextual;
  per-repeat parameter instances (weight_share_model.py:57-77) are stored as
  a leading ``repeats`` axis on each lookup table.

Piecewise index function: Eq.(18) of the iRPE paper (_irpe.py:15-48).
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

METHODS = ("euc", "quant", "cross", "product")
MODES = ("bias", "contextual")


@dataclasses.dataclass(frozen=True)
class RpeConfig:
    """Static iRPE config (reference get_rpe_config, _irpe.py:819-883).

    ``rpe_on`` selects attachment points: any subset of "qkv".
    """

    ratio: float = 1.9
    method: str = "product"
    mode: str = "contextual"
    shared_head: bool = True
    skip: int = 1  # 1 = cls token precedes spatial tokens
    rpe_on: str = "k"

    def __post_init__(self):
        if self.method not in METHODS:
            raise ValueError(f"method must be one of {METHODS}, got {self.method}")
        if self.mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {self.mode}")

    @property
    def alpha(self) -> float:
        return 1.0 * self.ratio

    @property
    def beta(self) -> float:
        return 2.0 * self.ratio

    @property
    def gamma(self) -> float:
        return 8.0 * self.ratio

    def num_buckets(self, method: Optional[str] = None) -> int:
        """Bucket count incl. the skip-token bucket (_irpe.py:256-279,809-816)."""
        method = method or self.method
        beta_int = int(self.beta)
        if method == "product":
            n = (2 * beta_int + 1) ** 2
        else:
            n = 2 * beta_int + 1
        if self.skip > 0:
            n += 1
        return n


def rpe_config_from_dict(d) -> Optional[RpeConfig]:
    """Build an RpeConfig from a YAML dict (None passes through)."""
    if d is None:
        return None
    if isinstance(d, RpeConfig):
        return d
    return RpeConfig(**d)


# ---------------------------------------------------------------------------
# Host-side bucket tables (numpy, cached)
# ---------------------------------------------------------------------------


def _piecewise_index(rel: np.ndarray, alpha: float, beta: float, gamma: float) -> np.ndarray:
    """np version of the paper's piecewise index fn (_irpe.py:15-48)."""
    rel = rel.astype(np.float64)
    rp_abs = np.abs(rel)
    inner = np.round(rel)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_part = np.log(rp_abs / alpha) / math.log(gamma / alpha) * (beta - alpha)
        outer = np.sign(rel) * np.minimum(np.round(alpha + log_part), beta)
    outer = np.nan_to_num(outer)  # |rel| <= alpha entries use the inner branch anyway
    idx = np.where(rp_abs <= alpha, inner, outer)
    return idx.astype(np.int64)


def _method_bucket_ids(method: str, diff: np.ndarray, alpha, beta, gamma) -> np.ndarray:
    """diff: [L, L, 2] row/col offsets -> bucket ids (before skip handling)."""
    beta_int = int(beta)
    if method == "product":
        S = 2 * beta_int + 1
        r = _piecewise_index(diff[:, :, 0], alpha, beta, gamma) + beta_int
        c = _piecewise_index(diff[:, :, 1], alpha, beta, gamma) + beta_int
        return r * S + c
    if method == "euc":
        dis = np.round(np.sqrt((diff ** 2).sum(2).astype(np.float64)))
        return _piecewise_index(dis, alpha, beta, gamma) + beta_int
    if method == "quant":
        dis = (diff ** 2).sum(2)
        return _piecewise_index(dis, alpha, beta, gamma) + beta_int
    if method == "cross_rows":
        return _piecewise_index(diff[:, :, 0], alpha, beta, gamma) + beta_int
    if method == "cross_cols":
        return _piecewise_index(diff[:, :, 1], alpha, beta, gamma) + beta_int
    raise NotImplementedError(method)


@lru_cache(maxsize=64)
def bucket_ids_2d(
    method: str, height: int, width: int, skip: int, alpha: float, beta: float, gamma: float
) -> Tuple[np.ndarray, int]:
    """[skip+L, skip+L] bucket ids + bucket count (_irpe.py:359-411)."""
    rows = np.arange(height)[:, None].repeat(width, 1)
    cols = np.arange(width)[None, :].repeat(height, 0)
    pos = np.stack([rows, cols], 2).reshape(height * width, 2)
    diff = pos[:, None, :] - pos[None, :, :]
    ids = _method_bucket_ids(method, diff, alpha, beta, gamma)

    beta_int = int(beta)
    if method == "product":
        num = (2 * beta_int + 1) ** 2
    else:
        num = 2 * beta_int + 1

    L = height * width
    if skip > 0:
        out = np.full((skip + L, skip + L), num, dtype=np.int64)
        out[skip:, skip:] = ids
        num += 1
        ids = out
    return ids.astype(np.int32), num


@lru_cache(maxsize=64)
def onehot_bucket_table(
    method: str, height: int, width: int, skip: int, alpha: float, beta: float, gamma: float
) -> np.ndarray:
    """One-hot [L, num_buckets, L] table: T[i, n, j] = (bucket(i,j) == n)."""
    ids, num = bucket_ids_2d(method, height, width, skip, alpha, beta, gamma)
    L = ids.shape[0]
    table = np.zeros((L, num, L), dtype=np.float32)
    i_idx = np.repeat(np.arange(L), L)
    j_idx = np.tile(np.arange(L), L)
    table[i_idx, ids.reshape(-1), j_idx] = 1.0
    return table


def _grid_hw(seq_len: int, skip: int) -> Tuple[int, int]:
    E = int(math.isqrt(seq_len - skip))
    if E * E != seq_len - skip:
        raise ValueError(f"seq_len {seq_len} minus skip {skip} is not a square grid")
    return E, E


# ---------------------------------------------------------------------------
# Parameters + application (flax side)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class RpeParams:
    """Declared lookup tables + static tables for one attention module."""

    config: RpeConfig
    seq_len: int
    num_heads: int
    head_dim: int
    q_table: Optional[Array] = None  # transposed tables: [R, H', d, buckets] or bias [R, H', buckets]
    k_table: Optional[Array] = None
    v_table: Optional[Array] = None  # non-transposed: [R, H', buckets, d]


def _sub_methods(method: str):
    return ("cross_rows", "cross_cols") if method == "cross" else (method,)


def build_rpe_params(
    module: nn.Module,
    config: RpeConfig,
    head_dim: int,
    num_heads: int,
    seq_len: int,
    repeats: int,
) -> RpeParams:
    """Declare per-repeat lookup-table params on ``module`` (build_rpe,
    _irpe.py:886-927).  Zero-init like the reference (:463-492)."""
    heads = 1 if config.shared_head else num_heads
    nb = config.num_buckets("product" if config.method == "product" else config.method)
    n_sub = len(_sub_methods(config.method))

    def declare(name, shape):
        return module.param(name, nn.initializers.zeros, shape, jnp.float32)

    q_table = k_table = v_table = None
    if "q" in config.rpe_on:
        if config.mode == "bias":
            q_table = declare("rpe_q_bias", (repeats, n_sub, heads, nb))
        else:
            q_table = declare("rpe_q_weight", (repeats, n_sub, heads, head_dim, nb))
    if "k" in config.rpe_on:
        if config.mode == "bias":
            k_table = declare("rpe_k_bias", (repeats, n_sub, heads, nb))
        else:
            k_table = declare("rpe_k_weight", (repeats, n_sub, heads, head_dim, nb))
    if "v" in config.rpe_on:
        if config.mode != "contextual":
            raise NotImplementedError("bias non-transposed RPE does not exist (_irpe.py:486)")
        v_table = declare("rpe_v_weight", (repeats, n_sub, heads, nb, head_dim))

    return RpeParams(
        config=config,
        seq_len=seq_len,
        num_heads=num_heads,
        head_dim=head_dim,
        q_table=q_table,
        k_table=k_table,
        v_table=v_table,
    )


def _tables_for(params: RpeParams):
    cfg = params.config
    h, w = _grid_hw(params.seq_len, cfg.skip)
    tabs = []
    for m in _sub_methods(cfg.method):
        tabs.append(
            jnp.asarray(onehot_bucket_table(m, h, w, cfg.skip, cfg.alpha, cfg.beta, cfg.gamma))
        )
    return tabs


def _transposed_rpe(params: RpeParams, table: Array, repeat_id: int, x: Array) -> Array:
    """RPE on q or k: x [B, H, L, d] -> additive [B, H, L, L] encoding.

    contextual: ret[b,h,i,j] = (x[b,h,i] . W[h,:,bucket(i,j)])
      = einsum(x, W) -> [B,H,L,buckets], then one-hot contraction on MXU.
    bias: ret[h,i,j] = bias[h, bucket(i,j)].
    """
    cfg = params.config
    out = None
    for sub_idx, onehot in enumerate(_tables_for(params)):
        t = table[repeat_id, sub_idx]  # [H', d, nb] or [H', nb]
        onehot = onehot.astype(x.dtype)
        if cfg.mode == "bias":
            enc = jnp.einsum("hn,inj->hij", t.astype(x.dtype), onehot)[None]  # [1,H',L,L]
            enc = jnp.broadcast_to(
                enc, (x.shape[0], params.num_heads, enc.shape[2], enc.shape[3])
            )
        else:
            lookup = jnp.einsum(
                "bhid,hdn->bhin", x, t.astype(x.dtype), preferred_element_type=jnp.float32
            )
            if cfg.shared_head:
                lookup = jnp.broadcast_to(
                    lookup, (x.shape[0], x.shape[1]) + lookup.shape[2:]
                )
            enc = jnp.einsum(
                "bhin,inj->bhij", lookup.astype(x.dtype), onehot,
                preferred_element_type=jnp.float32,
            )
        out = enc if out is None else out + enc
    return out


def _no_transpose_rpe(params: RpeParams, table: Array, repeat_id: int, attn: Array) -> Array:
    """RPE on values: attn [B, H, L, L] -> [B, H, L, d] addend.

    out[b,h,i,d] = sum_j attn[b,h,i,j] * W[h, bucket(i,j), d]
                 = einsum over the one-hot table (all MXU contractions).
    """
    out = None
    for sub_idx, onehot in enumerate(_tables_for(params)):
        t = table[repeat_id, sub_idx]  # [H', nb, d]
        w_exp = jnp.einsum(
            "inj,hnd->hijd", onehot.astype(attn.dtype), t.astype(attn.dtype),
            preferred_element_type=jnp.float32,
        )
        enc = jnp.einsum(
            "bhij,hijd->bhid", attn, w_exp.astype(attn.dtype),
            preferred_element_type=jnp.float32,
        ).astype(attn.dtype)
        out = enc if out is None else out + enc
    return out


def rpe_on_keys(params: RpeParams, repeat_id: int, q: Array) -> Array:
    """attn += rpe_k(q) (weight_share_model.py:107-108)."""
    if params.k_table is None:
        return jnp.zeros(q.shape[:3] + (q.shape[2],), dtype=q.dtype)
    return _transposed_rpe(params, params.k_table, repeat_id, q)


def rpe_on_queries(params: RpeParams, repeat_id: int, k_scaled: Array) -> Array:
    """attn += rpe_q(k * scale).transpose(2,3) (weight_share_model.py:111-112)."""
    if params.q_table is None:
        return jnp.zeros(k_scaled.shape[:3] + (k_scaled.shape[2],), dtype=k_scaled.dtype)
    enc = _transposed_rpe(params, params.q_table, repeat_id, k_scaled)
    return jnp.swapaxes(enc, 2, 3)


def rpe_on_values(params: RpeParams, repeat_id: int, attn: Array) -> Array:
    """out += rpe_v(attn) (weight_share_model.py:128-129)."""
    if params.v_table is None:
        return jnp.zeros(
            attn.shape[:3] + (params.head_dim,), dtype=attn.dtype
        )
    return _no_transpose_rpe(params, params.v_table, repeat_id, attn)
