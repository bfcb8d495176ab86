"""Retrieval metrics: top-k accuracy, diagonal scores, logits helpers.

TPU-native equivalents of the reference's torchmetrics-based evaluation
(distil_model.py:171-191, 224-231).  Top-k accuracy avoids a full sort:
the rank of the diagonal entry is the number of strictly-larger logits in
its row, so acc@k = mean(rank < k) — one comparison matrix, all ks at once.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

DEFAULT_KS = (1, 3, 5, 10, 20, 50)


def l2_normalize_f32(x: Array) -> Array:
    x = x.astype(jnp.float32)
    return x / jnp.linalg.norm(x, axis=1, keepdims=True)


def norm_and_logits(encode: Array, stu_encode: Array, tea_encode: Array):
    """Reference norm_and_logits (distil_model.py:224-231)."""
    encode = l2_normalize_f32(encode)
    stu = l2_normalize_f32(stu_encode)
    tea = l2_normalize_f32(tea_encode)
    stu_logits = stu @ encode.T
    tea_logits = tea @ encode.T
    return stu_logits, tea_logits, stu_logits.T, tea_logits.T


def topk_accuracy(logits: Array, ks: Sequence[int] = DEFAULT_KS) -> Dict[int, Array]:
    """acc@k with diagonal labels, ties broken pessimistically like a stable
    ranking (strictly-greater count)."""
    diag = jnp.diagonal(logits)[:, None]
    rank = jnp.sum(logits > diag, axis=1)  # 0 = best
    return {k: jnp.mean((rank < k).astype(jnp.float32)) for k in ks}


def diag_scores(logits: Array) -> Tuple[Array, Array]:
    """(mean diagonal score, mean diagonal softmax score)
    (distil_model.py:171-178)."""
    softmax_logits = jax.nn.softmax(logits, axis=1)
    return jnp.mean(jnp.diagonal(logits)), jnp.mean(jnp.diagonal(softmax_logits))
