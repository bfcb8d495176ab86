"""Model component tests: shapes, taps, weight sharing, torch-conv parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from distillclip_tpu.models import (
    CLIPModel,
    ControlFlags,
    ImageEncoder,
    RepeatTextTransformer,
    RepeatVisionTransformer,
    RpeConfig,
    TextEncoder,
    TextTransformer,
    VisionTransformer,
)
from distillclip_tpu.models.vit import patchify

KEY = jax.random.PRNGKey(0)
ALL_FLAGS = ControlFlags(True, True, True, True, True)


def test_patchify_matches_torch_conv():
    """Reshape+matmul patchify == torch Conv2d(stride=patch, bias=False)."""
    rng = np.random.default_rng(0)
    B, H, W, C, P, D = 2, 16, 16, 3, 8, 12
    imgs = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w_oihw = rng.normal(size=(D, C, P, P)).astype(np.float32)

    conv = torch.nn.Conv2d(C, D, P, stride=P, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.tensor(w_oihw))
    ref = conv(torch.tensor(imgs).permute(0, 3, 1, 2))  # [B, D, gh, gw]
    ref = ref.flatten(2).permute(0, 2, 1).detach().numpy()  # [B, N, D]

    # our kernel layout: [(kh kw I), O] matching (ph, pw, c) pixel order
    kernel = np.transpose(w_oihw, (2, 3, 1, 0)).reshape(P * P * C, D)
    ours = patchify(jnp.asarray(imgs), P) @ jnp.asarray(kernel)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_vit_tap_shapes():
    vit = VisionTransformer(input_resolution=32, patch_size=8, width=64, layers=3,
                            heads=4, output_dim=16, need_layers=[0, 2])
    imgs = jax.random.normal(KEY, (2, 32, 32, 3))
    params = vit.init(KEY, imgs, ALL_FLAGS)
    out = vit.apply(params, imgs, ALL_FLAGS)
    N = 17  # 16 patches + cls
    assert out.last_representation.shape == (2, 16)
    assert out.last_layer_output.shape == (2, N, 16)
    assert out.attention_scores.shape == (2, 2, 4, N, N)  # 2 selected layers
    assert out.representations.shape == (2, 2, N, 64)
    assert out.value_map.shape == (2, 4, N, N)
    assert out.embedding.shape == (2, N, 64)
    # no taps requested -> pruned to None
    out2 = vit.apply(params, imgs, ControlFlags())
    assert out2.attention_scores is None and out2.representations is None
    assert out2.value_map is None and out2.embedding is None


def test_text_causal_mask():
    """A causal tower's token-t feature must not depend on tokens > t."""
    txt = TextTransformer(vocab_size=50, context_length=8, width=32, layers=2,
                          heads=4, output_dim=16)
    toks = jnp.array([[5, 7, 9, 11, 13, 15, 17, 49]])
    params = txt.init(KEY, toks, ControlFlags())
    out1 = txt.apply(params, toks, ControlFlags())
    toks2 = toks.at[0, 5].set(3)  # mutate a position AFTER index 2
    out2 = txt.apply(params, toks2, ControlFlags())
    np.testing.assert_allclose(
        np.asarray(out1.last_layer_output[0, :3]),
        np.asarray(out2.last_layer_output[0, :3]),
        rtol=1e-5, atol=1e-6,
    )


def test_text_eot_pooling():
    """last_representation == last_layer_output at argmax-token position."""
    txt = TextTransformer(vocab_size=50, context_length=8, width=32, layers=1,
                          heads=4, output_dim=16)
    toks = jnp.array([[5, 49, 9, 1, 1, 1, 1, 1], [1, 2, 3, 49, 1, 1, 1, 1]])
    params = txt.init(KEY, toks, ControlFlags())
    out = txt.apply(params, toks, ControlFlags())
    np.testing.assert_allclose(np.asarray(out.last_representation[0]),
                               np.asarray(out.last_layer_output[0, 1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.last_representation[1]),
                               np.asarray(out.last_layer_output[1, 3]), rtol=1e-5)


def test_weight_sharing_param_count():
    """depth=4 repeated x2 has the qkv/proj/mlp params of 2 blocks, not 4,
    plus per-repeat norms and head transforms."""
    shared = RepeatVisionTransformer(img_size=16, patch_size=8, out_dim=8, embed_dim=32,
                                     depth=4, num_heads=4, repeated_times=2,
                                     qkv_bias=True, use_transform=True)
    unshared = RepeatVisionTransformer(img_size=16, patch_size=8, out_dim=8, embed_dim=32,
                                       depth=4, num_heads=4, repeated_times=1,
                                       qkv_bias=True, use_transform=True)
    imgs = jax.random.normal(KEY, (1, 16, 16, 3))
    p_shared = shared.init(KEY, imgs, ControlFlags())
    p_unshared = unshared.init(KEY, imgs, ControlFlags())
    n_shared = sum(x.size for x in jax.tree.leaves(p_shared))
    n_unshared = sum(x.size for x in jax.tree.leaves(p_unshared))
    assert n_shared < n_unshared
    # 2 param blocks in the shared model
    assert "blocks_0" in p_shared["params"] and "blocks_1" in p_shared["params"]
    assert "blocks_2" not in p_shared["params"]
    assert "blocks_3" in p_unshared["params"]
    # per-repeat norms exist
    assert "norm1_0" in p_shared["params"]["blocks_0"]
    assert "norm1_1" in p_shared["params"]["blocks_0"]


def test_repeat_vision_tap_count():
    """All executed repeats contribute taps: depth 4 = 2 blocks x 2 repeats."""
    m = RepeatVisionTransformer(img_size=16, patch_size=8, out_dim=8, embed_dim=32,
                                depth=4, num_heads=4, repeated_times=2)
    imgs = jax.random.normal(KEY, (2, 16, 16, 3))
    params = m.init(KEY, imgs, ALL_FLAGS)
    out = m.apply(params, imgs, ALL_FLAGS)
    assert out.attention_scores.shape[0] == 4
    assert out.representations.shape[0] == 4


def test_repeat_text_bidirectional():
    """Reference quirk: weight-share text student has NO causal mask."""
    m = RepeatTextTransformer(vocab_size=50, context_length=8, out_dim=8, embed_dim=32,
                              depth=2, num_heads=4, repeated_times=2)
    toks = jnp.array([[5, 7, 9, 11, 13, 15, 17, 49]])
    params = m.init(KEY, toks, ControlFlags())
    out1 = m.apply(params, toks, ControlFlags())
    out2 = m.apply(params, toks.at[0, 5].set(3), ControlFlags())
    # early positions DO change: attention is bidirectional
    assert not np.allclose(np.asarray(out1.last_layer_output[0, 0]),
                           np.asarray(out2.last_layer_output[0, 0]), atol=1e-6)


@pytest.mark.quick
def test_rpe_is_exact_noop_at_zero_init():
    """Zero-init lookup tables (reference _irpe.py:463-492) => the RPE model
    with the BASE model's shared weights grafted in produces the base
    model's outputs exactly."""
    from flax.traverse_util import flatten_dict, unflatten_dict

    kw = dict(img_size=16, patch_size=8, out_dim=8, embed_dim=32,
              depth=2, num_heads=4, repeated_times=2)
    base = RepeatVisionTransformer(**kw)
    with_rpe = RepeatVisionTransformer(rpe_config=RpeConfig(rpe_on="qkv"), **kw)
    imgs = jax.random.normal(KEY, (1, 16, 16, 3))
    p_rpe = with_rpe.init(KEY, imgs, ControlFlags())
    p_base = base.init(jax.random.PRNGKey(7), imgs, ControlFlags())

    # graft: every shared (non-rpe) leaf comes from the BASE init (a
    # DIFFERENT seed, so shared leaves provably differ from p_rpe's);
    # rpe_* tables keep their zero init
    flat_base = flatten_dict(p_base["params"])
    flat_rpe = flatten_dict(p_rpe["params"])
    assert set(flat_base) < set(flat_rpe)  # rpe adds params, shares the rest
    merged = {k: flat_base.get(k, v) for k, v in flat_rpe.items()}
    for k, v in merged.items():
        if any(str(part).startswith("rpe_") for part in k):
            assert not np.asarray(v).any(), f"rpe table {k} not zero-init"
    merged = {"params": unflatten_dict(merged)}

    out_rpe = with_rpe.apply(merged, imgs, ALL_FLAGS)
    out_base = base.apply(p_base, imgs, ALL_FLAGS)
    np.testing.assert_array_equal(
        np.asarray(out_rpe.last_representation), np.asarray(out_base.last_representation))
    np.testing.assert_array_equal(
        np.asarray(out_rpe.attention_scores), np.asarray(out_base.attention_scores))


@pytest.mark.quick
def test_rpe_contextual_einsum_matches_bucket_gather():
    """The one-hot MXU einsum gather == direct bucket-indexed computation
    (reference semantics: _irpe.py:581-643 contextual forward)."""
    from distillclip_tpu.models.irpe import (
        RpeConfig, RpeParams, bucket_ids_2d, rpe_on_keys, rpe_on_values,
    )

    cfg = RpeConfig(rpe_on="kv", shared_head=False, skip=1)
    B, H, d = 2, 3, 4
    h_grid = w_grid = 3
    L = cfg.skip + h_grid * w_grid
    nb = cfg.num_buckets()
    rng = np.random.default_rng(0)
    k_table = rng.normal(size=(1, 1, H, d, nb)).astype(np.float32)
    v_table = rng.normal(size=(1, 1, H, nb, d)).astype(np.float32)
    params = RpeParams(config=cfg, seq_len=L, num_heads=H, head_dim=d,
                       k_table=jnp.asarray(k_table), v_table=jnp.asarray(v_table))
    ids, num = bucket_ids_2d("product", h_grid, w_grid, cfg.skip,
                             cfg.alpha, cfg.beta, cfg.gamma)
    assert num == nb and ids.shape == (L, L)

    # rpe_on_keys: ret[b,h,i,j] = q[b,h,i] . W_k[h, :, bucket(i,j)]
    q = rng.normal(size=(B, H, L, d)).astype(np.float32)
    got = np.asarray(rpe_on_keys(params, 0, jnp.asarray(q)))
    want = np.empty((B, H, L, L), np.float32)
    for i in range(L):
        for j in range(L):
            want[:, :, i, j] = np.einsum("bhd,hd->bh", q[:, :, i], k_table[0, 0, :, :, ids[i, j]])
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # rpe_on_values: ret[b,h,i,:] = sum_j attn[b,h,i,j] * W_v[h, bucket(i,j), :]
    attn = rng.normal(size=(B, H, L, L)).astype(np.float32)
    got_v = np.asarray(rpe_on_values(params, 0, jnp.asarray(attn)))
    want_v = np.zeros((B, H, L, d), np.float32)
    for i in range(L):
        for j in range(L):
            want_v[:, :, i] += attn[:, :, i, j, None] * v_table[0, 0, :, ids[i, j], :]
    np.testing.assert_allclose(got_v, want_v, rtol=2e-5, atol=2e-5)


def test_student_projection_applied():
    enc = ImageEncoder(is_student=True, input_resolution=16, patch_size=8, width=32,
                       layers=2, heads=4, output_dim=8, teacher_width=48)
    imgs = jax.random.normal(KEY, (2, 16, 16, 3))
    flags = ControlFlags(need_emb=True, need_rep=True)
    params = enc.init(KEY, imgs, flags)
    out = enc.apply(params, imgs, flags)
    assert out.embedding.shape[-1] == 48
    assert out.representations.shape[-1] == 48


def test_clip_model_logits():
    vit = VisionTransformer(input_resolution=16, patch_size=8, width=32, layers=1,
                            heads=4, output_dim=16)
    txt = TextTransformer(vocab_size=50, context_length=8, width=32, layers=1,
                          heads=4, output_dim=16)
    clip = CLIPModel(image_tower=vit, text_tower=txt)
    imgs = jax.random.normal(KEY, (3, 16, 16, 3))
    toks = jax.random.randint(KEY, (3, 8), 0, 50)
    params = clip.init(KEY, toks, imgs, ControlFlags())
    out = clip.apply(params, toks, imgs, ControlFlags())
    assert out.i2t_logits.shape == (3, 3)
    np.testing.assert_allclose(np.asarray(out.i2t_logits), np.asarray(out.t2i_logits.T))
    # cosine logits bounded
    assert np.abs(np.asarray(out.i2t_logits)).max() <= 1.0 + 1e-5
    # score() fast path agrees
    img_f, txt_f, logits = clip.apply(params, toks, imgs, method=clip.score)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(out.i2t_logits),
                               rtol=1e-5, atol=1e-6)


def test_tail_gating_pooled_rep_identical():
    """need_last_layer=False pools first and runs norm+head on one row per
    sample; the pooled representation must equal the full-tail path (LN and
    dense are per-row), and the full path must still emit all positions."""
    from distillclip_tpu.models.outputs import ControlFlags
    from distillclip_tpu.models.repeat_vit import (
        RepeatTextTransformer,
        RepeatVisionTransformer,
    )

    rng = jax.random.PRNGKey(0)
    # text tower
    txt = RepeatTextTransformer(
        vocab_size=512, context_length=32, out_dim=24, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2, use_transform=True,
    )
    tokens = np.random.default_rng(3).integers(1, 500, size=(4, 32))
    tokens[:, -1] = 511
    tokens = jnp.asarray(tokens)
    params = txt.init(rng, tokens, ControlFlags())
    o_lean = txt.apply(params, tokens, ControlFlags())
    o_full = txt.apply(params, tokens, ControlFlags(need_last_layer=True))
    np.testing.assert_allclose(
        np.asarray(o_lean.last_representation),
        np.asarray(o_full.last_representation), rtol=2e-5, atol=2e-5)
    assert o_full.last_layer_output.shape == (4, 32, 24)
    assert o_lean.last_layer_output.shape == (4, 1, 24)

    # vision tower
    vit = RepeatVisionTransformer(
        img_size=32, patch_size=16, embed_dim=32, depth=2, num_heads=4,
        repeated_times=2, out_dim=24, use_transform=True,
    )
    imgs = jnp.asarray(np.random.default_rng(4).standard_normal(
        (2, 32, 32, 3)), jnp.float32)
    vparams = vit.init(rng, imgs, ControlFlags())
    v_lean = vit.apply(vparams, imgs, ControlFlags())
    v_full = vit.apply(vparams, imgs, ControlFlags(need_last_layer=True))
    np.testing.assert_allclose(
        np.asarray(v_lean.last_representation),
        np.asarray(v_full.last_representation), rtol=2e-5, atol=2e-5)


def test_true_n_rows_matches_padded_towers():
    """DISTILLCLIP_TRUE_N=1 (towers at the real token count, kernels pad at
    their boundary) produces the same outputs and param grads as the default
    tower-level padding, for both the plain ViT and the weight-share student."""
    import os

    imgs = jax.random.normal(KEY, (2, 16, 16, 3))
    vit = VisionTransformer(input_resolution=16, patch_size=8, width=32,
                            layers=2, heads=4, output_dim=8)  # N = 5 tokens
    stu = RepeatVisionTransformer(img_size=16, patch_size=8, out_dim=8,
                                  embed_dim=32, depth=2, num_heads=4,
                                  repeated_times=2, use_transform=True)
    flags = ControlFlags()

    def run(model):
        params = model.init(KEY, imgs, flags)
        out = model.apply(params, imgs, flags).last_representation
        g = jax.grad(lambda p: jnp.sum(
            model.apply(p, imgs, flags).last_representation ** 2))(params)
        return np.asarray(out), jax.tree.map(np.asarray, g)

    old = os.environ.get("DISTILLCLIP_TRUE_N")
    try:
        os.environ["DISTILLCLIP_TRUE_N"] = "0"
        base = {m.__class__.__name__: run(m) for m in (vit, stu)}
        os.environ["DISTILLCLIP_TRUE_N"] = "1"
        true_n = {m.__class__.__name__: run(m) for m in (vit, stu)}
    finally:
        (os.environ.pop("DISTILLCLIP_TRUE_N", None) if old is None
         else os.environ.__setitem__("DISTILLCLIP_TRUE_N", old))

    for name in base:
        np.testing.assert_allclose(base[name][0], true_n[name][0],
                                   rtol=1e-4, atol=1e-4, err_msg=name)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                a, b, rtol=1e-3, atol=1e-3, err_msg=name),
            base[name][1], true_n[name][1],
        )
