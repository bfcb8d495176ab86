"""Fused attention kernel correctness vs the unfused XLA reference.

On CPU the kernels run in Pallas interpret mode (same program, interpreted);
on TPU hardware they compile via Mosaic.  The bench/TPU side is exercised by
bench.py runs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distillclip_tpu.ops import flash_attention, reference_attention

B, H, N, D = 3, 4, 18, 32
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def qkv():
    q = jax.random.normal(KEY, (B, H, N, D), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, N, D), jnp.float32)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, N, D), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity(qkv, causal):
    q, k, v = qkv
    o1 = flash_attention(q, k, v, causal=causal)
    o2 = reference_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)


def test_gradient_parity(qkv):
    q, k, v = qkv

    def loss(f):
        return lambda q, k, v: (f(q, k, v) ** 2).sum()

    g1 = jax.grad(loss(lambda a, b, c: flash_attention(a, b, c)), argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss(lambda a, b, c: reference_attention(a, b, c)), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_transform_forward_and_grad_parity(qkv):
    q, k, v = qkv
    wl = jax.random.normal(jax.random.PRNGKey(3), (H, H), jnp.float32) * 0.2
    ww = jax.random.normal(jax.random.PRNGKey(4), (H, H), jnp.float32) * 0.2

    o1 = flash_attention(q, k, v, head_transform=(wl, ww))
    o2 = reference_attention(q, k, v, head_transform=(wl, ww))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)

    def loss(f):
        return lambda q, k, v, wl, ww: (f(q, k, v, head_transform=(wl, ww)) ** 2).sum()

    g1 = jax.grad(loss(flash_attention), argnums=(0, 1, 2, 3, 4))(q, k, v, wl, ww)
    g2 = jax.grad(loss(reference_attention), argnums=(0, 1, 2, 3, 4))(q, k, v, wl, ww)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_rejects_long_sequences(qkv):
    q = jnp.zeros((1, 1, 512, 32))
    with pytest.raises(ValueError):
        flash_attention(q, q, q)
