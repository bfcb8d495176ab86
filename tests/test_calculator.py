"""LossCalculator combiner semantics + control flags + vit_kd wiring."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick  # fast oracle tests (-m quick inner loop)

import jax
import jax.numpy as jnp

from distillclip_tpu.losses import LossCalculator
from distillclip_tpu.losses import functional as F
from distillclip_tpu.models.outputs import CLIPOutput, ControlFlags, TextOutput, VisionOutput


def _tower(rng, B=6, N=5, D=8, L=3, H=2, out=8):
    k = {}
    k["last_representation"] = jnp.asarray(rng.normal(size=(B, out)), jnp.float32)
    k["last_layer_output"] = jnp.asarray(rng.normal(size=(B, N, out)), jnp.float32)
    k["attention_scores"] = jnp.asarray(rng.normal(size=(L, B, H, N, N)), jnp.float32)
    k["attention_probs"] = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(L, B, H, N, N)), jnp.float32), axis=-1
    )
    k["representations"] = jnp.asarray(rng.normal(size=(L, B, N, D)), jnp.float32)
    k["value_map"] = jnp.asarray(rng.normal(size=(B, H, N, N)), jnp.float32)
    k["embedding"] = jnp.asarray(rng.normal(size=(B, N, D)), jnp.float32)
    return VisionOutput(**k)


def test_percent_defaults_uniform():
    calc = LossCalculator(["out_l1", "out_cos"])
    assert calc.percent == {"out_l1": 0.5, "out_cos": 0.5}
    assert calc.loss_scale == {"out_l1": 1, "out_cos": 1}


def test_percent_partial_fill():
    # deviation from reference default-fill rule (see calculator.py): the
    # leftover mass spreads over the MISSING losses so the sum is 1
    calc = LossCalculator(["out_l1", "out_cos", "out_ce"], percent={"out_l1": 0.5, "out_cos": 0.25})
    assert abs(calc.percent["out_ce"] - 0.25) < 1e-9
    assert abs(sum(calc.percent.values()) - 1) < 1e-5


def test_percent_invalid_raises():
    with pytest.raises(ValueError):
        LossCalculator(["out_l1", "out_cos"], percent={"out_l1": 1.5, "out_cos": 0.1})


def test_control_flags():
    calc = LossCalculator(
        ["embedding_mse", "attention_score_mse", "attention_probs_kl", "hidden_rep_mse",
         "last_value_map_kl"]
    )
    flags = calc.control_flags()
    assert flags.need_emb and flags.need_attn_score and flags.need_rep and flags.need_value_map
    # documented deviation: attention_probs_kl correctly requests probs
    assert flags.need_attn_prob


def test_one_tower_weighting():
    rng = np.random.default_rng(1)
    stu, tea = _tower(rng), _tower(rng)
    calc = LossCalculator(["out_l1", "out_cos"], loss_scale={"out_l1": 2.0},
                          percent={"out_l1": 0.7, "out_cos": 0.3})
    total, res = calc.one_tower(stu, tea)
    l1 = F.out_l1(stu.last_representation, tea.last_representation)
    cos = F.out_cos(stu.last_representation, tea.last_representation)
    np.testing.assert_allclose(res["out_l1"], 2.0 * l1, rtol=1e-6)
    np.testing.assert_allclose(total, 0.7 * 2.0 * l1 + 0.3 * cos, rtol=1e-6)


def test_two_tower_totals():
    rng = np.random.default_rng(2)
    B = 6
    vis_s, vis_t = _tower(rng), _tower(rng)
    txt_s = TextOutput(**{k: v for k, v in vars(_tower(rng)).items()})
    txt_t = TextOutput(**{k: v for k, v in vars(_tower(rng)).items()})
    logits_s = jnp.asarray(rng.normal(size=(B, B)), jnp.float32)
    logits_t = jnp.asarray(rng.normal(size=(B, B)), jnp.float32)
    stu = CLIPOutput(visual_output=vis_s, text_output=txt_s,
                     i2t_logits=logits_s, t2i_logits=logits_s.T)
    tea = CLIPOutput(visual_output=vis_t, text_output=txt_t,
                     i2t_logits=logits_t, t2i_logits=logits_t.T)

    calc = LossCalculator(["out_l1", "out_cos", "cos_diff"], loss_scale={"cos_diff": 0.1})
    total, res = calc.two_tower(stu, tea)

    img_total, _ = calc.one_tower(vis_s, vis_t)
    txt_total, _ = calc.one_tower(txt_s, txt_t)
    cd = 0.5 * (F.cos_diff(logits_s, logits_t) + F.cos_diff(logits_s.T, logits_t.T))
    expected = 0.5 * (img_total + txt_total) + 0.1 * cd * calc.percent["cos_diff"]
    np.testing.assert_allclose(total, expected, rtol=1e-6)
    assert "image_out_l1" in res and "text_out_cos" in res


def test_vit_kd_end_to_end():
    rng = np.random.default_rng(3)
    B, N, L = 4, 10, 3  # N = 1 cls + 9 tokens (3x3 grid)
    stu = _tower(rng, B=B, N=N, D=8, L=L)
    tea = _tower(rng, B=B, N=N, D=16, L=L)
    calc = LossCalculator(
        ["vit_kd"],
        vit_kd_para={"student_dims": 8, "teacher_dims": 16,
                     "low_layers_num": 2, "high_layers_num": 1},
    )
    key = jax.random.PRNGKey(0)
    variables = calc.init_vit_kd(key, stu, tea)
    total, res = calc.one_tower(stu, tea, vit_kd_variables=variables, rng=key)
    assert np.isfinite(float(total))
    # align linears + mask token + generation convs all present
    names = jax.tree_util.tree_map(lambda x: x.shape, variables["params"])
    assert "align_low_0" in names and "mask_token" in names and "generation_conv1_0" in names


def test_smd_multi_model_registered_two_tower():
    """smd_multi_model is a registered two-tower loss here (the reference
    exports a broken, never-registered version, _loss.py:57-98)."""
    rng = np.random.default_rng(4)
    B = 6
    vis_s, vis_t = _tower(rng), _tower(rng)
    txt_s = TextOutput(**{k: v for k, v in vars(_tower(rng)).items()})
    txt_t = TextOutput(**{k: v for k, v in vars(_tower(rng)).items()})
    logits = jnp.asarray(rng.normal(size=(B, B)), jnp.float32)
    stu = CLIPOutput(visual_output=vis_s, text_output=txt_s,
                     i2t_logits=logits, t2i_logits=logits.T)
    tea = CLIPOutput(visual_output=vis_t, text_output=txt_t,
                     i2t_logits=logits, t2i_logits=logits.T)

    calc = LossCalculator(["out_l1", "smd_multi_model"], smd_tau=0.1)
    total, res = calc.two_tower(stu, tea)
    expected = F.smd_multi_model(
        vis_t.last_representation, vis_s.last_representation,
        txt_s.last_representation, tau=0.1,
    )
    np.testing.assert_allclose(res["smd_multi_model"], expected, rtol=1e-6)
    assert np.isfinite(float(total))
    # and it is NOT computed on the one-tower path
    _, one_res = calc.one_tower(vis_s, vis_t)
    assert "smd_multi_model" not in one_res
