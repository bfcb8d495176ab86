"""Fused attention kernel correctness vs the unfused XLA reference.

On CPU the kernels run in Pallas interpret mode (same program, interpreted);
on TPU hardware they compile via Mosaic.  The bench/TPU side is exercised by
bench.py runs.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from distillclip_tpu.ops import flash_attention, reference_attention

# mid-tier inner loop for kernel work: `-m kernels` runs just this file's
# oracle suite (between `-m quick` ~70s and the ~24 min full suite);
# hardware-side evidence is tools/hw_oracle.py
pytestmark = pytest.mark.kernels

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


@pytest.mark.parametrize("act", ["gelu_exact", "quick_gelu"])
def test_fc1_dense_act_parity(act):
    """Fused fc1+activation kernel: values + all grads vs plain XLA.

    The erf inside the kernel is the Abramowitz-Stegun approximation
    (max abs err 1.5e-7) so fp32 parity is tight."""
    from distillclip_tpu.ops.fc1_act import dense_act

    rng = np.random.default_rng(3)
    rows, C, Hf = 64, 96, 128
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(C, Hf)).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.normal(size=(Hf,)).astype(np.float32) * 0.1)

    def ref(x, w, b):
        u = x @ w + b
        if act == "gelu_exact":
            return jax.nn.gelu(u, approximate=False)
        return u * jax.nn.sigmoid(1.702 * u)

    y_k = dense_act(x, w, b, act)
    np.testing.assert_allclose(np.asarray(y_k), np.asarray(ref(x, w, b)),
                               rtol=1e-4, atol=1e-4)

    co = jnp.asarray(rng.normal(size=(rows, Hf)).astype(np.float32))
    gk = jax.grad(lambda *a: jnp.sum(dense_act(*a, act) * co),
                  argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(lambda *a: jnp.sum(ref(*a) * co), argnums=(0, 1, 2))(x, w, b)
    for name, a, e in zip(("dx", "dw", "db"), gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-3, atol=1e-3, err_msg=name)


def test_fc1_dense_act_bf16_params_tree():
    """Mlp with the kernel path declares the identical param tree as the
    XLA path (checkpoint compatibility)."""
    from distillclip_tpu.models.repeat_vit import Mlp

    x2 = jnp.zeros((8, 32))
    m = Mlp(in_features=32, hidden_features=64)
    flash_env, fc1_env = "DISTILLCLIP_FLASH", "DISTILLCLIP_FC1"
    import os

    old = {k: os.environ.get(k) for k in (flash_env, fc1_env)}
    try:
        os.environ[flash_env], os.environ[fc1_env] = "1", "kernel"
        p_kernel = m.init(jax.random.PRNGKey(0), x2)
        os.environ[fc1_env] = "xla"
        p_xla = m.init(jax.random.PRNGKey(0), x2)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else os.environ.__setitem__(k, v)
    assert jax.tree_util.tree_structure(p_kernel) == jax.tree_util.tree_structure(p_xla)
    for a, b in zip(jax.tree_util.tree_leaves(p_kernel),
                    jax.tree_util.tree_leaves(p_xla)):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


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


def test_sharded_kernel_grads():
    """Kernels under an active mesh run per-shard (shard_map), not replicated.

    Root cause of the round-3 suite hang: pallas_call has no SPMD
    partitioning rule, so under plain pjit the partitioner replicates the
    custom call and all-gathers every operand per grid step (measured: one
    flash fwd+bwd = 150 all-gathers on an 8-device mesh); on the 1-core CPU
    host the rendezvous storm deadlocks.  ops/_shard.py routes kernel entry
    points through shard_map.  This test asserts (a) zero all-gathers /
    collective-permutes in the compiled sharded grad, and (b) grads —
    including the psum'd replicated-weight grads — match the unsharded path.
    """
    import re

    from jax.sharding import NamedSharding, PartitionSpec as P

    from distillclip_tpu.ops.fc1_act import dense_act
    from distillclip_tpu.ops.transform_attention import transform_attention_rows_flat
    from distillclip_tpu.parallel.mesh import active_mesh, create_mesh, set_active_mesh

    prev = active_mesh()
    mesh = create_mesh(n_model=1)
    try:
        sh = NamedSharding(mesh, P("data"))
        rng = np.random.default_rng(0)
        rows, C = 16 * 16, 64  # B=16 samples of seq=16 over 8 devices
        q = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32) * 0.3)
        wl = jnp.asarray(np.eye(4, dtype=np.float32) + 0.05 * rng.normal(size=(4, 4)).astype(np.float32))
        ww = jnp.asarray(np.eye(4, dtype=np.float32) + 0.05 * rng.normal(size=(4, 4)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(C, 128)).astype(np.float32) * 0.05)
        b = jnp.zeros((128,), jnp.float32)

        def loss_tf(q, wl, ww):
            o = transform_attention_rows_flat(q, q, q, wl, ww, heads=4, seq=16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def loss_fc1(x, w, b):
            return jnp.sum(dense_act(x, w, b, "gelu_exact").astype(jnp.float32) ** 2)

        from distillclip_tpu.ops.blockdiag_attention import blockdiag_attention_rows_qkv

        qkvf = jnp.asarray(rng.normal(size=(rows, 3 * 128)).astype(np.float32) * 0.3)

        def loss_bd(qkvf):
            o = blockdiag_attention_rows_qkv(qkvf, heads=4, seq=16)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        for loss, args, shardings in (
            (loss_tf, (q, wl, ww), (sh, None, None)),
            (loss_fc1, (x, w, b), (sh, None, None)),
            (loss_bd, (qkvf,), (sh,)),
        ):
            g = jax.grad(loss, argnums=tuple(range(len(args))))
            comp = jax.jit(g, in_shardings=shardings).lower(
                jax.device_put(args[0], sh), *args[1:]
            ).compile()
            hlo = comp.as_text()
            assert not re.search(r"all-gather\(|collective-permute\(", hlo), (
                "kernel was replicated under the mesh (collective storm)"
            )
            g_sh = comp(jax.device_put(args[0], sh), *args[1:])
            set_active_mesh(None)
            g_ref = g(*args)
            set_active_mesh(mesh)
            for a, e in zip(g_sh, g_ref):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(e), rtol=2e-4, atol=2e-4
                )
    finally:
        set_active_mesh(prev)


def test_factored_transform_matches_oracle():
    """transform_factored.tf_factored_qkv == the unfused XLA math, f+b.

    The factored kernel (true-FLOP per-head dots + VPU head mixes) must be
    interchangeable with the colcat kernel: same API, same values, same
    grads including dwl/dww (which the kernel emits via column assembly /
    a device-side transpose).  Covers both text-like (Np=80, h=12, d=64)
    and image-like (Np=64, h=24, d=32) geometries, and an hc>1 chunking.
    """
    from distillclip_tpu.ops.transform_attention import _xla_transform_rows
    from distillclip_tpu.ops.transform_factored import tf_factored_qkv

    # (B, Np, h, d, n, hc, scores, mix): covers the default perhead/fma
    # path, an hc>1 chunking, and the selectable scaled/roll modes — all
    # paths got per-iteration scratch regions in the round-5 WAR-hazard fix
    # and each must stay exact in interpret mode (hardware: hw_oracle
    # --only factored)
    for (B, Np, h, d, n, hc, scores, mix) in (
        (2, 80, 4, 16, 77, None, None, None),
        (2, 64, 8, 16, 50, None, None, None),
        (2, 64, 8, 16, 50, 4, None, None),
        (2, 64, 8, 16, 50, None, "scaled", None),
        (2, 64, 8, 16, 50, 4, "scaled", None),
        (2, 64, 8, 16, 50, None, None, "roll"),
    ):
        if hc is not None:
            os.environ["DISTILLCLIP_TF_HC"] = str(hc)
        else:
            os.environ.pop("DISTILLCLIP_TF_HC", None)
        if scores is not None:
            os.environ["DISTILLCLIP_TF_SCORES"] = scores
        else:
            os.environ.pop("DISTILLCLIP_TF_SCORES", None)
        if mix is not None:
            os.environ["DISTILLCLIP_TF_MIX"] = mix
        else:
            os.environ.pop("DISTILLCLIP_TF_MIX", None)
        try:
            HD = h * d
            rng = np.random.default_rng(1)
            qkv = jnp.asarray(rng.standard_normal((B * Np, 3 * HD)) * 0.5,
                              jnp.float32)
            wl = jnp.asarray(rng.standard_normal((h, h)) * 0.3, jnp.float32)
            ww = jnp.asarray(rng.standard_normal((h, h)) * 0.3, jnp.float32)
            do = jnp.asarray(rng.standard_normal((B * Np, HD)), jnp.float32)
            scale = 1.0 / np.sqrt(d)

            def ref(qkv, wl, ww):
                to3 = lambda t: t.reshape(B, Np, HD)
                return _xla_transform_rows(
                    to3(qkv[:, :HD]), to3(qkv[:, HD:2 * HD]),
                    to3(qkv[:, 2 * HD:]), wl, ww, scale, n, h
                ).reshape(B * Np, HD)

            def fac(qkv, wl, ww):
                return tf_factored_qkv(qkv, wl, ww, scale, n, h, Np)

            o_r, vjp_r = jax.vjp(ref, qkv, wl, ww)
            o_f, vjp_f = jax.vjp(fac, qkv, wl, ww)

            def rel(a, b):
                return float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))

            assert rel(o_f, o_r) < 1e-2, (B, Np, h, d, hc, scores, mix)
            for name, a, b in zip(("dqkv", "dwl", "dww"), vjp_f(do), vjp_r(do)):
                assert rel(a, b) < 2e-2, (name, B, Np, h, d, hc, scores, mix)
        finally:
            os.environ.pop("DISTILLCLIP_TF_HC", None)
            os.environ.pop("DISTILLCLIP_TF_SCORES", None)
            os.environ.pop("DISTILLCLIP_TF_MIX", None)


def test_dense_act_ln_matches_oracle():
    """dense_act_ln == LayerNorm(fp32) -> dense -> GELU, values and grads."""
    from distillclip_tpu.ops.fc1_act import dense_act_ln

    rows, C, H = 64, 32, 128
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((rows, C)) * 1.7 + 0.3, jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32)
    b = jnp.asarray(0.05 * rng.standard_normal(H), jnp.float32)
    dh = jnp.asarray(rng.standard_normal((rows, H)), jnp.float32)
    eps = 1e-5

    def ref(x, ls, lb, w, b):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        xn = (x32 - mu) * jax.lax.rsqrt(var + eps) * ls + lb
        u = xn.astype(x.dtype) @ w + b
        return jax.nn.gelu(u, approximate=False)

    def fused(x, ls, lb, w, b):
        return dense_act_ln(x, ls, lb, w, b, "gelu_exact", eps)

    o_r, vjp_r = jax.vjp(ref, x, ls, lb, w, b)
    o_f, vjp_f = jax.vjp(fused, x, ls, lb, w, b)

    def rel(a, e):
        return float(jnp.abs(a - e).max() / (jnp.abs(e).max() + 1e-9))

    assert rel(o_f, o_r) < 5e-3
    for name, a, e in zip(("dx", "dls", "dlb", "dw", "db"), vjp_f(dh), vjp_r(dh)):
        assert rel(a, e) < 1e-2, name


def test_dense_ln_matches_oracle():
    """dense_ln (norm1+qkv fusion) == LN -> dense, values and grads, with
    and without bias."""
    from distillclip_tpu.ops.fc1_act import dense_ln

    rows, C, H = 64, 32, 96
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((rows, C)) * 1.3 - 0.2, jnp.float32)
    ls = jnp.asarray(1.0 + 0.1 * rng.standard_normal(C), jnp.float32)
    lb = jnp.asarray(0.1 * rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((C, H)) * 0.1, jnp.float32)
    b = jnp.asarray(0.05 * rng.standard_normal(H), jnp.float32)
    du = jnp.asarray(rng.standard_normal((rows, H)), jnp.float32)
    eps = 1e-5

    def rel(a, e):
        return float(jnp.abs(a - e).max() / (jnp.abs(e).max() + 1e-9))

    def ln(x, ls_, lb_):
        x32 = x.astype(jnp.float32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
        return (x32 - mu) * jax.lax.rsqrt(var + eps) * ls_ + lb_

    # with bias
    o_r, vjp_r = jax.vjp(lambda x, ls_, lb_, w_, b_:
                         ln(x, ls_, lb_).astype(x.dtype) @ w_ + b_, x, ls, lb, w, b)
    o_f, vjp_f = jax.vjp(lambda x, ls_, lb_, w_, b_:
                         dense_ln(x, ls_, lb_, w_, b_, eps), x, ls, lb, w, b)
    assert rel(o_f, o_r) < 5e-3
    for name, a, e in zip(("dx", "dls", "dlb", "dw", "db"), vjp_f(du), vjp_r(du)):
        assert rel(a, e) < 1e-2, name

    # bias-less (qkv_bias=False configs)
    o_r2, vjp_r2 = jax.vjp(lambda x, ls_, lb_, w_:
                           ln(x, ls_, lb_).astype(x.dtype) @ w_, x, ls, lb, w)
    o_f2, vjp_f2 = jax.vjp(lambda x, ls_, lb_, w_:
                           dense_ln(x, ls_, lb_, w_, None, eps), x, ls, lb, w)
    assert rel(o_f2, o_r2) < 5e-3
    for name, a, e in zip(("dx", "dls", "dlb", "dw"), vjp_f2(du), vjp_r2(du)):
        assert rel(a, e) < 1e-2, name


def test_identity_transform_is_plain_attention():
    """The colcat plain-attention route (flash_attention_rows_qkv ->
    transform kernel with identity mixes) is mathematically plain MHA.

    The dispatch itself is hardware-only (packed kernel keeps CPU interpret
    coverage), so this pins the equivalence it relies on: identity conv_l /
    conv_w through transform_attention_rows equals reference attention,
    including kv_len key masking.
    """
    from distillclip_tpu.ops.transform_attention import transform_attention_rows

    B2, H2, N2, D2 = 2, 12, 32, 16
    q2 = jax.random.normal(jax.random.PRNGKey(3), (B2, N2, H2 * D2), jnp.float32)
    k2 = jax.random.normal(jax.random.PRNGKey(4), (B2, N2, H2 * D2), jnp.float32)
    v2 = jax.random.normal(jax.random.PRNGKey(5), (B2, N2, H2 * D2), jnp.float32)
    eye = jnp.eye(H2, dtype=q2.dtype)
    to4 = lambda t: t.reshape(B2, N2, H2, D2).transpose(0, 2, 1, 3)
    for kv_len in (None, 20):
        o_id = transform_attention_rows(q2, k2, v2, eye, eye, heads=H2, kv_len=kv_len)
        o_ref = reference_attention(
            to4(q2), to4(k2), to4(v2), kv_len=kv_len
        ).transpose(0, 2, 1, 3).reshape(B2, N2, H2 * D2)
        n_ok = kv_len or N2
        # the colcat kernel casts its expanded operands to bf16 internally
        # (the towers feed it bf16 anyway); tolerance is bf16-product class
        np.testing.assert_allclose(
            np.asarray(o_id)[:, :n_ok], np.asarray(o_ref)[:, :n_ok],
            rtol=5e-3, atol=5e-3,
        )


def test_rows_qkv_unaligned_seq():
    """true-N rows mode: unaligned seq pads at the kernel boundary only
    (flash + transform entries), values and grads match the reference."""
    from distillclip_tpu.ops.flash_attention import flash_attention_rows_qkv
    from distillclip_tpu.ops.transform_attention import (
        transform_attention_rows_qkv,
    )

    B2, H2, N2, D2 = 2, 4, 18, 16
    HD = H2 * D2
    key = jax.random.PRNGKey(11)
    qkv = jax.random.normal(key, (B2 * N2, 3 * HD), jnp.float32) * 0.5
    to4 = lambda t: t.reshape(B2, N2, H2, D2).transpose(0, 2, 1, 3)
    frm = lambda t: t.transpose(0, 2, 1, 3).reshape(B2 * N2, HD)
    q3, k3, v3 = (to4(qkv[:, i * HD:(i + 1) * HD]) for i in range(3))

    for causal in (False, True):
        o = flash_attention_rows_qkv(qkv, heads=H2, seq=N2, causal=causal)
        o_ref = frm(reference_attention(q3, k3, v3, causal=causal))
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=2e-5, atol=2e-5)

    g = jax.grad(lambda a: jnp.sum(
        flash_attention_rows_qkv(a, heads=H2, seq=N2, causal=True) ** 2))(qkv)
    g_ref = jax.grad(lambda a: jnp.sum(frm(reference_attention(
        *(to4(a[:, i * HD:(i + 1) * HD]) for i in range(3)),
        causal=True)) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-4)

    wl = jax.random.normal(jax.random.PRNGKey(12), (H2, H2), jnp.float32) * 0.2
    ww = jax.random.normal(jax.random.PRNGKey(13), (H2, H2), jnp.float32) * 0.2
    o_t = transform_attention_rows_qkv(qkv, wl, ww, heads=H2, seq=N2)
    o_tref = frm(reference_attention(q3, k3, v3, head_transform=(wl, ww)))
    np.testing.assert_allclose(np.asarray(o_t), np.asarray(o_tref),
                               rtol=5e-3, atol=5e-3)
    gt = jax.grad(lambda a, l, w: jnp.sum(transform_attention_rows_qkv(
        a, l, w, heads=H2, seq=N2) ** 2), argnums=(0, 1, 2))(qkv, wl, ww)
    gt_ref = jax.grad(lambda a, l, w: jnp.sum(frm(reference_attention(
        *(to4(a[:, i * HD:(i + 1) * HD]) for i in range(3)),
        head_transform=(l, w))) ** 2), argnums=(0, 1, 2))(qkv, wl, ww)
    for name, a, e in zip(("dqkv", "dwl", "dww"), gt, gt_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=5e-3, atol=5e-3, err_msg=name)


@pytest.mark.parametrize("h2,d2,causal", [(4, 32, False), (4, 64, False),
                                          (4, 64, True), (8, 64, True)])
def test_blockdiag_plain_attention(h2, d2, causal):
    """Block-diag plain attention (hc = 128/d heads per dot) matches the
    reference in values AND grads, including kv_len key masking and the
    causal mask (text towers, weight_share_model.py:469-471).

    The dispatch in flash_attention_rows_qkv is hardware-only; this pins
    the kernel math directly (interpret mode on CPU)."""
    from distillclip_tpu.ops.blockdiag_attention import (
        blockdiag_attention_rows_qkv,
        blockdiag_supported,
    )

    assert blockdiag_supported(h2, d2, causal=causal)
    B2, N2 = 2, 32
    HD = h2 * d2
    qkvf = jax.random.normal(jax.random.PRNGKey(7),
                             (B2 * N2, 3 * HD), jnp.float32) * 0.5
    to4 = lambda t: t.reshape(B2, N2, h2, d2).transpose(0, 2, 1, 3)
    frm = lambda t: t.transpose(0, 2, 1, 3).reshape(B2 * N2, HD)

    for kv_len in (None, 20):
        o = blockdiag_attention_rows_qkv(qkvf, heads=h2, seq=N2,
                                         causal=causal, kv_len=kv_len)
        o_ref = frm(reference_attention(
            *(to4(qkvf[:, i * HD:(i + 1) * HD]) for i in range(3)),
            causal=causal, kv_len=kv_len))
        # in-kernel probs/operands are bf16 (as the towers feed them)
        np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref),
                                   rtol=2e-2, atol=2e-2)

    g = jax.grad(lambda a: jnp.sum(jnp.sin(blockdiag_attention_rows_qkv(
        a, heads=h2, seq=N2, causal=causal, kv_len=20).astype(jnp.float32))))(qkvf)
    g_ref = jax.grad(lambda a: jnp.sum(jnp.sin(frm(reference_attention(
        *(to4(a[:, i * HD:(i + 1) * HD]) for i in range(3)),
        causal=causal, kv_len=20)).astype(jnp.float32))))(qkvf)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=3e-2, atol=3e-2)
