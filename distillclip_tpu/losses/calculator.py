"""LossCalculator: registry + weighted combiner of distillation losses.

TPU-native equivalent of reference model/_loss.py.  The calculator is a
*static* configuration object: jit-compatible because every decision it makes
(which losses, which taps, weights) is a Python-time constant; only the loss
arithmetic is traced.

Semantics reproduced from the reference:
* per-loss ``loss_scale`` (default 1, _loss.py:24-27),
* ``percent`` weights summing to 1 with the reference's default-fill rule
  (_loss.py:29-42),
* one-tower total = sum(scale_i * loss_i * percent_i) over non-image-text
  losses (_loss.py:195-201),
* two-tower total = 0.5*(image + text one-tower) + sum over IMAGE_TEXT_LOSS
  of scale_i * loss_i * percent_i (_loss.py:148-153).

Documented deviation: for ``attention_probs_kl`` the reference sets a
nonexistent ControlOutput field (_loss.py:111-112) so the loss receives
empty lists and would divide by zero; we set ``need_attn_prob`` (the
evident intent) instead.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from distillclip_tpu.losses import functional as F
from distillclip_tpu.losses.vit_kd import ViTKDLoss
from distillclip_tpu.models.outputs import CLIPOutput, ControlFlags, TextOutput, VisionOutput

Array = jax.Array
TowerOutput = Union[VisionOutput, TextOutput]

LOSS_NAMES = (
    "out_l1", "out_ce", "out_kl", "out_cos", "embedding_mse",
    "attention_score_mse", "attention_probs_mse", "hidden_rep_mse",
    "attention_probs_kl", "last_value_map_kl", "vit_kd", "smd",
    "hard_label", "soft_label", "fine_grain", "logits_mse", "cos_diff",
    # exported-but-unregistered (and broken) in the reference
    # (smd_multi_model.py, _loss.py:57-98); fixed + registered here —
    # see losses/functional.py smd_multi_model
    "smd_multi_model",
)

# losses computed on the contrastive logits / cross-tower features
# (_loss.py:14)
IMAGE_TEXT_LOSS = ("hard_label", "soft_label", "logits_mse", "fine_grain",
                   "cos_diff", "smd_multi_model")


class LossCalculator:
    """Static loss configuration + pure combiner (reference _loss.py:17-216)."""

    def __init__(
        self,
        loss_name: List[str],
        loss_scale: Optional[Dict[str, float]] = None,
        temperature: Optional[float] = None,
        percent: Optional[Dict[str, float]] = None,
        smd_tau: float = 0.04,
        vit_kd_para: Optional[Dict[str, Any]] = None,
    ):
        for n in loss_name:
            if n not in LOSS_NAMES:
                raise ValueError(f"Invalid Loss Type: {n}")
        self.loss_name = list(loss_name)

        self.loss_scale: Dict[str, float] = {}
        if loss_scale is None:
            loss_scale = {n: 1 for n in self.loss_name}
        for n in self.loss_name:
            self.loss_scale[n] = loss_scale.get(n, 1)

        if percent is None:
            percent = {n: 1.0 / len(self.loss_name) for n in self.loss_name}
        self.percent = dict(percent)
        missing = [n for n in self.loss_name if n not in self.percent]
        if missing:
            # Deviation (documented): the reference divides the leftover mass
            # by len(provided) instead of len(missing) (_loss.py:32), which
            # trips its own sum==1 assert for any partial percent dict.  We
            # spread the remaining mass over the MISSING losses.
            default_value = (1 - sum(self.percent.values())) / len(missing)
            if default_value <= 0:
                raise ValueError(
                    f"there are some loss default percent is negative. "
                    f"Please check the sum of the percent {percent}; "
                    f"default_value={default_value}"
                )
            for n in missing:
                self.percent[n] = default_value
        if abs(sum(self.percent.values()) - 1) > 1e-5:
            raise ValueError(f"percent must sum to 1, got {self.percent}")

        self.temperature = temperature
        self.smd_tau = smd_tau
        if vit_kd_para is not None:
            vit_kd_para = dict(vit_kd_para)
            vit_kd_para.setdefault("low_layers_num", 2)
            vit_kd_para.setdefault("high_layers_num", 1)
        self.vit_kd_para = vit_kd_para

        self.vit_kd_module: Optional[ViTKDLoss] = None
        if "vit_kd" in self.loss_name:
            if vit_kd_para is None:
                raise ValueError("vit_kd loss requires vit_kd_para")
            self.vit_kd_module = ViTKDLoss(**vit_kd_para)

        if any(n in ("out_kl", "soft_label") for n in self.loss_name) and not self.temperature:
            raise ValueError("temperature required for out_kl / soft_label")

    # -- control flags ------------------------------------------------------

    def control_flags(self) -> ControlFlags:
        """Which encoder taps the selected losses need (_loss.py:100-116)."""
        names = set(self.loss_name)
        return ControlFlags(
            need_emb="embedding_mse" in names,
            need_attn_score="attention_score_mse" in names,
            # deviation: reference sets a nonexistent field for
            # attention_probs_kl (_loss.py:111-112); intent restored here.
            need_attn_prob=bool(names & {"attention_probs_mse", "attention_probs_kl"}),
            need_rep=bool(names & {"hidden_rep_mse", "vit_kd"}),
            need_value_map="last_value_map_kl" in names,
            need_last_layer="fine_grain" in names,
        )

    # -- vit_kd variables ----------------------------------------------------

    @property
    def has_params(self) -> bool:
        return self.vit_kd_module is not None

    def init_vit_kd(self, rng: Array, stu_out: TowerOutput, tea_out: TowerOutput):
        """Initialize ViTKD variables from example tower outputs."""
        pred_s, pred_t = self._vit_kd_inputs(stu_out, tea_out)
        init_rng, mask_rng = jax.random.split(rng)
        return self.vit_kd_module.init({"params": init_rng, "mask": mask_rng}, pred_s, pred_t)

    def _vit_kd_inputs(self, stu_out: TowerOutput, tea_out: TowerOutput):
        """Slice low/high stacked reps (_loss.py:182-192): [L,B,N,D] ->
        [B, k, N, D]."""
        low = self.vit_kd_para["low_layers_num"]
        high = self.vit_kd_para["high_layers_num"]
        sr, tr = stu_out.representations, tea_out.representations
        assert sr is not None and tr is not None
        assert low + high <= sr.shape[0], "vit_kd needs low+high <= collected layers"
        to_b_first = lambda x: jnp.swapaxes(x, 0, 1)  # [L,B,N,D] -> [B,L,N,D]
        pred_s = [to_b_first(sr[:low]), to_b_first(sr[-high:])]
        pred_t = [to_b_first(tr[:low]), to_b_first(tr[-high:])]
        return pred_s, pred_t

    # -- loss paths ----------------------------------------------------------

    def one_tower(
        self,
        stu_out: TowerOutput,
        tea_out: TowerOutput,
        vit_kd_variables=None,
        rng: Optional[Array] = None,
        skip_vit_kd: bool = False,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Single-tower distillation losses (_loss.py:155-202).

        ``skip_vit_kd`` zeroes the vit_kd term (keeping the weighting
        structure): the dual path passes it for the TEXT tower, whose token
        grid is not square — ViTKD's generation head is an image-feature-map
        loss (vit_kd.py conv head).  Documented deviation: the reference
        applies one-tower losses symmetrically (_loss.py:118-153) and would
        crash on text+vit_kd, a combination its configs never exercise.
        """
        res: Dict[str, Array] = {}
        for name in self.loss_name:
            if name in IMAGE_TEXT_LOSS:
                continue
            if name == "out_l1":
                res[name] = F.out_l1(stu_out.last_representation, tea_out.last_representation)
            elif name == "out_ce":
                res[name] = F.out_ce(stu_out.last_representation, tea_out.last_representation)
            elif name == "out_kl":
                res[name] = F.out_kl(
                    stu_out.last_representation, tea_out.last_representation, self.temperature
                )
            elif name == "out_cos":
                res[name] = F.out_cos(stu_out.last_representation, tea_out.last_representation)
            elif name == "embedding_mse":
                res[name] = F.embedding_mse(stu_out.embedding, tea_out.embedding)
            elif name == "attention_score_mse":
                res[name] = F.attention_score_mse(
                    stu_out.attention_scores, tea_out.attention_scores
                )
            elif name == "attention_probs_mse":
                res[name] = F.attention_probs_mse(
                    stu_out.attention_probs, tea_out.attention_probs
                )
            elif name == "attention_probs_kl":
                res[name] = F.attention_probs_kl(
                    stu_out.attention_probs, tea_out.attention_probs
                )
            elif name == "hidden_rep_mse":
                res[name] = F.hidden_rep_mse(stu_out.representations, tea_out.representations)
            elif name == "last_value_map_kl":
                res[name] = F.last_value_map_kl(stu_out.value_map, tea_out.value_map)
            elif name == "smd":
                res[name] = F.smd(
                    tea_out.last_representation, stu_out.last_representation, tau=self.smd_tau
                )
            elif name == "vit_kd":
                if skip_vit_kd:
                    res[name] = jnp.float32(0.0)
                    continue
                if vit_kd_variables is None or rng is None:
                    raise ValueError("vit_kd requires vit_kd_variables and rng")
                pred_s, pred_t = self._vit_kd_inputs(stu_out, tea_out)
                res[name] = self.vit_kd_module.apply(
                    vit_kd_variables, pred_s, pred_t, rngs={"mask": rng}
                )

        total = jnp.float32(0.0)
        for name, scale in self.loss_scale.items():
            if name in IMAGE_TEXT_LOSS:
                continue
            res[name] = res[name] * scale
            total = total + res[name] * self.percent[name]
        return total, res

    def two_tower(
        self,
        stu_out: CLIPOutput,
        tea_out: CLIPOutput,
        vit_kd_variables=None,
        rng: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Dual-tower losses (_loss.py:118-153): 0.5*(image + text one-tower)
        + weighted image-text losses."""
        res: Dict[str, Array] = {}
        rng_i = rng_t = None
        if rng is not None:
            rng_i, rng_t = jax.random.split(rng)
        image_loss, image_res = self.one_tower(
            stu_out.visual_output, tea_out.visual_output, vit_kd_variables, rng_i
        )
        text_loss, text_res = self.one_tower(
            stu_out.text_output, tea_out.text_output, vit_kd_variables, rng_t,
            skip_vit_kd=True,  # image-feature-map loss; see one_tower doc
        )
        for k, v in image_res.items():
            res["image_" + k] = v
        for k, v in text_res.items():
            res["text_" + k] = v

        for name in self.loss_name:
            if name == "hard_label":
                res[name] = 0.5 * (
                    F.hard_label(stu_out.i2t_logits) + F.hard_label(stu_out.t2i_logits)
                )
            elif name == "soft_label":
                assert self.temperature
                res[name] = 0.5 * (
                    F.soft_label(stu_out.i2t_logits, tea_out.i2t_logits, self.temperature)
                    + F.soft_label(stu_out.t2i_logits, tea_out.t2i_logits, self.temperature)
                )
            elif name == "logits_mse":
                res[name] = 0.5 * (
                    F.logits_mse(stu_out.i2t_logits, tea_out.i2t_logits)
                    + F.logits_mse(stu_out.t2i_logits, tea_out.t2i_logits)
                )
            elif name == "fine_grain":
                res[name] = F.fine_grain(
                    stu_out.visual_output.last_layer_output,
                    stu_out.text_output.last_layer_output,
                )
            elif name == "cos_diff":
                res[name] = 0.5 * (
                    F.cos_diff(stu_out.i2t_logits, tea_out.i2t_logits)
                    + F.cos_diff(stu_out.t2i_logits, tea_out.t2i_logits)
                )
            elif name == "smd_multi_model":
                res[name] = F.smd_multi_model(
                    tea_out.visual_output.last_representation,
                    stu_out.visual_output.last_representation,
                    stu_out.text_output.last_representation,
                    tau=self.smd_tau,
                )

        total = 0.5 * (image_loss + text_loss)
        for name, scale in self.loss_scale.items():
            if name in IMAGE_TEXT_LOSS:
                res[name] = res[name] * scale
                total = total + res[name] * self.percent[name]
        return total, res

    def __call__(
        self,
        stu_out,
        tea_out,
        model_type: str,
        vit_kd_variables=None,
        rng: Optional[Array] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        """Dispatch per model_type ('image' | 'text' | 'all'), matching
        reference forward (_loss.py:204-210)."""
        if model_type == "all":
            return self.two_tower(stu_out, tea_out, vit_kd_variables, rng)
        return self.one_tower(stu_out, tea_out, vit_kd_variables, rng)
