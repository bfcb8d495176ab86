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


def test_rows_layout_matches_reference():
    """flash_attention_rows on [B, N, H*d] == reference on [B, H, N, d]."""
    from distillclip_tpu.ops.flash_attention import flash_attention_rows

    B2, H2, N2, D2 = 2, 4, 32, 16
    key = jax.random.PRNGKey(7)
    q2 = jax.random.normal(key, (B2, N2, H2 * D2), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(8), (B2, N2, H2 * D2), jnp.float32)
    v2 = jax.random.normal(jax.random.PRNGKey(9), (B2, N2, H2 * D2), jnp.float32)

    to4 = lambda t: t.reshape(B2, N2, H2, D2).transpose(0, 2, 1, 3)
    for causal, kv_len in [(False, None), (True, None), (False, 20), (True, 20)]:
        o_rows = flash_attention_rows(q2, k2, v2, heads=H2, causal=causal, kv_len=kv_len)
        o_ref = reference_attention(
            to4(q2), to4(k2), to4(v2), causal=causal, kv_len=kv_len
        ).transpose(0, 2, 1, 3).reshape(B2, N2, H2 * D2)
        if kv_len:
            o_rows, o_ref = o_rows[:, :kv_len], o_ref[:, :kv_len]
        np.testing.assert_allclose(
            np.asarray(o_rows), np.asarray(o_ref), rtol=2e-5, atol=2e-5
        )


def test_rows_layout_gradients():
    from distillclip_tpu.ops.flash_attention import flash_attention_rows

    B2, H2, N2, D2 = 2, 4, 32, 16
    q2 = jax.random.normal(jax.random.PRNGKey(7), (B2, N2, H2 * D2), jnp.float32)
    to4 = lambda t: t.reshape(B2, N2, H2, D2).transpose(0, 2, 1, 3)

    def loss_rows(q, k, v):
        return (flash_attention_rows(q, k, v, heads=H2, kv_len=20)[:, :20] ** 2).sum()

    def loss_ref(q, k, v):
        o = reference_attention(to4(q), to4(k), to4(v), kv_len=20)
        o = o.transpose(0, 2, 1, 3).reshape(B2, N2, H2 * D2)
        return (o[:, :20] ** 2).sum()

    g1 = jax.grad(loss_rows, argnums=(0, 1, 2))(q2, q2, q2)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q2, q2, q2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_transform_fused_backward_kernel(monkeypatch):
    """The fused pallas backward (DISTILLCLIP_TF_BWD=kernel) must produce
    the same five gradients as the default XLA-recompute backward."""
    from distillclip_tpu.ops.transform_attention import transform_attention_rows

    monkeypatch.setenv("DISTILLCLIP_TF_BWD", "kernel")
    B2, H2, N2, D2 = 2, 4, 32, 16
    key = jax.random.PRNGKey(11)
    ks = jax.random.split(key, 6)
    q2 = jax.random.normal(ks[0], (B2, N2, H2 * D2), jnp.float32)
    k2 = jax.random.normal(ks[1], (B2, N2, H2 * D2), jnp.float32)
    v2 = jax.random.normal(ks[2], (B2, N2, H2 * D2), jnp.float32)
    wl = jnp.eye(H2) + 0.2 * jax.random.normal(ks[3], (H2, H2))
    ww = jnp.eye(H2) + 0.2 * jax.random.normal(ks[4], (H2, H2))
    co = jax.random.normal(ks[5], (B2, N2, H2 * D2), jnp.float32)

    def loss(a, b, c, l, w):
        o = transform_attention_rows(a, b, c, l, w, heads=H2, kv_len=20)
        return (o.astype(jnp.float32) * co).sum()

    g_kernel = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q2, k2, v2, wl, ww)
    monkeypatch.setenv("DISTILLCLIP_TF_BWD", "xla")
    g_xla = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(q2, k2, v2, wl, ww)
    for name, a, b in zip(("dq", "dk", "dv", "dwl", "dww"), g_kernel, g_xla):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-9
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=2e-2,
            err_msg=name,
        )


def test_layer_norm_rows_matches_reduce():
    """Fused 2D LN kernel: values + all grads vs the fp32 reduce formulation."""
    import numpy as np

    from distillclip_tpu.ops.layer_norm import layer_norm_rows

    rng = np.random.default_rng(0)
    rows, C = 64, 96
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32) * 2 + 1.5,
                    jnp.bfloat16)
    s = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.3 + 1.0)
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32) * 0.1)

    def ref(x, s, b):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=-1, keepdims=True)
        v = jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True)
        return ((x32 - m) * jax.lax.rsqrt(v + 1e-5) * s + b).astype(x.dtype)

    y_k = layer_norm_rows(x, s, b)
    y_r = ref(x, s, b)
    np.testing.assert_allclose(np.asarray(y_k, np.float32),
                               np.asarray(y_r, np.float32), atol=2e-2)

    def loss_k(x, s, b):
        return jnp.sum(layer_norm_rows(x, s, b).astype(jnp.float32) ** 2)

    def loss_r(x, s, b):
        return jnp.sum(ref(x, s, b).astype(jnp.float32) ** 2)

    gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, s, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, s, b)
    for name, a, e in zip(("dx", "dscale", "dbias"), gk, gr):
        a32, e32 = np.asarray(a, np.float32), np.asarray(e, np.float32)
        denom = max(1e-3, float(np.abs(e32).max()))
        assert np.max(np.abs(a32 - e32)) / denom < 3e-2, name
