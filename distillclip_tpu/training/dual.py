"""Dual-tower joint distillation task (stage 3: L-CLIP).

TPU-native re-design of reference model/dual_distill_model.py
(DualDistillModel): both students in a CLIPModel, full CLIP teacher,
two-tower loss path, prefix freezing, stage-1/2 checkpoint composition.

Global negatives: the contrastive logits are computed over the FULL global
batch — features are sharded over the ``data`` axis and the [B, B] similarity
einsum makes XLA all-gather one operand over ICI.  The reference only saw
per-device negatives (DDP computes logits on local batches,
dual_distill_model.py:124); this is the north-star improvement called out in
SURVEY.md §2.6 and BASELINE.json, and it comes free from sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from distillclip_tpu.losses import LossCalculator
from distillclip_tpu.models import CLIPModel, ControlFlags
from distillclip_tpu.models.repeat_vit import RepeatVisionTransformer
from distillclip_tpu.models.teacher import teacher_load
from distillclip_tpu.parallel.mesh import batch_sharding, replicated
from distillclip_tpu.training import metrics as M
from distillclip_tpu.training.schedules import hf_cosine_with_warmup, per_epoch
from distillclip_tpu.training.train_state import (
    TrainState,
    cast_to_compute,
    freeze_mask,
    make_optimizer,
)

Array = jax.Array


def norm_last_representation(out):
    """L2-normalize both towers' last representations
    (dual_distill_model.py:278-284)."""
    return out.replace(
        visual_output=out.visual_output.replace(
            last_representation=out.visual_output.last_representation
            / jnp.linalg.norm(out.visual_output.last_representation, axis=-1, keepdims=True)
        ),
        text_output=out.text_output.replace(
            last_representation=out.text_output.last_representation
            / jnp.linalg.norm(out.text_output.last_representation, axis=-1, keepdims=True)
        ),
    )


@dataclasses.dataclass
class DualDistillTask:
    """Constructor mirrors DualDistillModel.__init__
    (dual_distill_model.py:42-91)."""

    image_student: Any
    text_student: Any
    loss_control_para: Dict[str, Any]
    warm_steps: int = 15
    total_steps: int = 300
    weight_decay: float = 1e-3
    lr: float = 1e-4
    download_root: str = "./.cache"
    norm: bool = False
    teacher_name: str = "ViT-B/32"
    freeze_embed: bool = False
    unfreeze_epoch: Optional[int] = None
    load_path: Optional[Dict[str, str]] = None
    teacher_need_layers: Optional[Sequence[int]] = None
    freeze_prefix: Optional[List[str]] = None
    compute_dtype: str = "bfloat16"
    grad_clip_norm: Optional[float] = None
    log_grad_norm: bool = False  # extra full-grad read per step; off like the reference
    # Lightning trainer.accumulate_grad_batches (l_clip.yaml:58); optimizer
    # updates fire every k micro-batches with the mean grad (optax.MultiSteps)
    accumulate_grad_batches: int = 1

    def __post_init__(self):
        self.student = CLIPModel(
            image_tower=self.image_student, text_tower=self.text_student
        )
        self.teacher, self.teacher_vars = teacher_load(
            self.teacher_name, self.download_root, "all",
            need_layers=self.teacher_need_layers,
        )
        self.loss_control = LossCalculator(**self.loss_control_para)
        self.flags: ControlFlags = self.loss_control.control_flags()
        self._dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        self._teacher_compute_vars = None

    @property
    def teacher_compute_vars(self):
        """Teacher variables pre-cast to the compute dtype once (see
        DistillTask.teacher_compute_vars)."""
        if self._teacher_compute_vars is None:
            self._teacher_compute_vars = jax.tree_util.tree_map(
                lambda x: x.astype(self._dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.teacher_vars,
            )
        return self._teacher_compute_vars

    # ------------------------------------------------------------------

    def init_params(self, rng: Array, sample_tokens: Array, sample_images: Array):
        from distillclip_tpu.training.train_state import prepare_inputs

        sample_images = prepare_inputs(jnp.asarray(sample_images), self._dtype)
        s_rng, kd_rng = jax.random.split(rng)
        # init under jit (see DistillTask.init_params)
        variables = jax.jit(
            lambda r, t, x: self.student.init(
                {"params": r}, t, x, self.flags, deterministic=True
            )
        )(s_rng, sample_tokens, sample_images)
        params = {"student": variables["params"]}
        if self.load_path:
            params["student"] = self._load_stage_checkpoints(params["student"])
        if self.loss_control.has_params:
            stu = self.student.apply(
                variables, sample_tokens, sample_images, self.flags
            )
            tea = self.teacher.apply(
                self.teacher_vars, sample_tokens, sample_images, self.flags
            )
            kd_vars = self.loss_control.init_vit_kd(
                kd_rng, stu.visual_output, tea.visual_output
            )
            params["loss_aux"] = kd_vars["params"]
        if self.freeze_embed:
            params["student"] = self._copy_teacher_embeddings(params["student"])
        return params

    def _load_stage_checkpoints(self, student_params):
        """Warm-start towers from stage-1/2 checkpoints, stripping the
        'student' scope (reference load_weight, dual_distill_model.py:22-38:
        strips the 'student.' key prefix)."""
        from distillclip_tpu.training.checkpoints import restore_tower_params

        sp = dict(student_params)
        if self.load_path.get("image") is None or self.load_path.get("text") is None:
            raise ValueError(
                "the cpk is None! if you set the load_path parameter you "
                "should give the image and text checkpoint path"
            )
        sp["image_tower"] = restore_tower_params(
            self.load_path["image"], sp["image_tower"]
        )
        sp["text_tower"] = restore_tower_params(self.load_path["text"], sp["text_tower"])
        return sp

    def _frozen_paths(self) -> List[str]:
        """freeze_image_embedding (dual_distill_model.py:270-301)."""
        if not self.freeze_embed:
            return []
        if isinstance(self.image_student, RepeatVisionTransformer):
            base = ["patch_kernel", "cls_token", "pos_embed"]
        else:
            base = ["visual/patch_kernel", "visual/class_embedding",
                    "visual/positional_embedding"]
        return [f"student/image_tower/{k}" for k in base]

    def _frozen_prefixes(self) -> List[str]:
        """freeze_with_prefix (dual_distill_model.py:253-261)."""
        if not self.freeze_prefix:
            return []
        return [f"student/{p.replace('.', '/')}" for p in self.freeze_prefix]

    def _copy_teacher_embeddings(self, student_params):
        tp = self.teacher_vars["params"]["image_tower"]["visual"]
        # fresh buffers: donated student state must not alias teacher_vars
        copy = lambda x: jnp.array(x, copy=True)
        sp = dict(student_params)
        tower = dict(sp["image_tower"])
        if isinstance(self.image_student, RepeatVisionTransformer):
            tower["patch_kernel"] = copy(tp["patch_kernel"])
            tower["cls_token"] = copy(tp["class_embedding"][None, None, :])
            tower["pos_embed"] = copy(tp["positional_embedding"][None])
        else:
            visual = dict(tower["visual"])
            visual["patch_kernel"] = copy(tp["patch_kernel"])
            visual["class_embedding"] = copy(tp["class_embedding"])
            visual["positional_embedding"] = copy(tp["positional_embedding"])
            tower["visual"] = visual
        sp["image_tower"] = tower
        return sp

    def make_optimizer(self, steps_per_epoch: int):
        k = max(1, int(self.accumulate_grad_batches or 1))
        # with accumulation the inner chain's count is optimizer UPDATES,
        # of which there are steps_per_epoch // k per epoch
        schedule = per_epoch(
            hf_cosine_with_warmup(self.lr, self.warm_steps, self.total_steps),
            max(1, steps_per_epoch // k),
        )
        self._lr_schedule = schedule  # the schedule the optimizer applies
        return make_optimizer(
            schedule, weight_decay=self.weight_decay,
            grad_clip_norm=self.grad_clip_norm,
            accumulate_steps=k,
        )

    def trainable_mask(self, params, frozen_embed: bool):
        frozen = self._frozen_paths() if frozen_embed else []
        prefixes = self._frozen_prefixes()
        if not (frozen or prefixes):
            return None
        return freeze_mask(params, frozen_paths=frozen, frozen_prefixes=prefixes)

    def init_state(self, rng, sample_tokens, sample_images, steps_per_epoch,
                   frozen_embed: Optional[bool] = None):
        params = self.init_params(rng, sample_tokens, sample_images)
        if frozen_embed is None:
            frozen_embed = self.freeze_embed
        tx = self.make_optimizer(steps_per_epoch)
        self._mask = self.trainable_mask(params, frozen_embed)
        return (
            TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params)),
            tx,
        )

    # ------------------------------------------------------------------

    def _forward(self, params, teacher_vars, tokens, images, rng, deterministic):
        from distillclip_tpu.training.train_state import prepare_inputs

        compute_params = cast_to_compute(params["student"], self._dtype)
        teacher_vars = jax.tree_util.tree_map(
            lambda x: x.astype(self._dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            teacher_vars,
        )  # no-op when the caller passes teacher_compute_vars (pre-cast bf16)
        rngs = None
        if not deterministic:
            d, p = jax.random.split(rng)
            rngs = {"dropout": d, "droppath": p}
        imgs = prepare_inputs(images, self._dtype)
        stu_out = self.student.apply(
            {"params": compute_params}, tokens, imgs, self.flags,
            deterministic=deterministic, rngs=rngs,
        )
        tea_out = self.teacher.apply(
            teacher_vars, tokens, imgs, self.flags, deterministic=True
        )
        tea_out = jax.lax.stop_gradient(tea_out)
        if self.norm:
            stu_out = norm_last_representation(stu_out)
            tea_out = norm_last_representation(tea_out)
        return stu_out, tea_out

    def loss_fn(self, params, teacher_vars, tokens, images, rng, deterministic):
        fwd_rng, kd_rng = jax.random.split(rng)
        stu_out, tea_out = self._forward(
            params, teacher_vars, tokens, images, fwd_rng, deterministic
        )
        kd_vars = {"params": params["loss_aux"]} if self.loss_control.has_params else None
        loss, parts = self.loss_control(
            stu_out, tea_out, "all", vit_kd_variables=kd_vars, rng=kd_rng
        )
        return loss, (parts, stu_out, tea_out)

    # -- cached frozen-text-teacher path (VERDICT r1 item 4) -------------
    #
    # Stage-3 captions are fixed token tensors while images are augmented:
    # the teacher TEXT tower's outputs are per-sample constants and can be
    # precomputed (reference pre-encodes fixed inputs the same way,
    # combine_text_dataset.py:59-82); the teacher image tower stays live.

    def loss_fn_cached_text(
        self, params, teacher_vars, tokens, images, tea_text_rep, rng, deterministic
    ):
        from distillclip_tpu.models import l2_normalize
        from distillclip_tpu.models.outputs import CLIPOutput, TextOutput
        from distillclip_tpu.training.train_state import prepare_inputs

        fwd_rng, kd_rng = jax.random.split(rng)
        compute_params = cast_to_compute(params["student"], self._dtype)
        rngs = None
        if not deterministic:
            d, p = jax.random.split(fwd_rng)
            rngs = {"dropout": d, "droppath": p}
        imgs = prepare_inputs(images, self._dtype)
        stu_out = self.student.apply(
            {"params": compute_params}, tokens, imgs, self.flags,
            deterministic=deterministic, rngs=rngs,
        )
        tea_vis = self.teacher.apply(
            teacher_vars, imgs, self.flags, deterministic=True, method="encode_image"
        )
        text_rep = tea_text_rep.astype(self._dtype)
        # last_layer_output is unread by no-tap losses (fine_grain is
        # student-only); the dummy slice keeps the pytree total
        tea_text = TextOutput(
            last_representation=text_rep, last_layer_output=text_rep[:, None, :]
        )
        # identical arithmetic to CLIPModel.__call__ (models/clip.py:53-65)
        image_feature = l2_normalize(tea_vis.last_representation)
        text_feature = l2_normalize(text_rep)
        logits = jnp.einsum(
            "id,td->it", image_feature, text_feature, preferred_element_type=jnp.float32
        )
        tea_out = CLIPOutput(
            visual_output=tea_vis, text_output=tea_text,
            i2t_logits=logits, t2i_logits=logits.T,
        )
        tea_out = jax.lax.stop_gradient(tea_out)
        if self.norm:
            stu_out = norm_last_representation(stu_out)
            tea_out = norm_last_representation(tea_out)
        kd_vars = {"params": params["loss_aux"]} if self.loss_control.has_params else None
        loss, parts = self.loss_control(
            stu_out, tea_out, "all", vit_kd_variables=kd_vars, rng=kd_rng
        )
        return loss, (parts, stu_out, tea_out)

    # -- fully-cached teacher path (documented deviation, VERDICT r3 item 3)
    #
    # The teacher IMAGE tower is live in the reference only because stage-3
    # train images are RandAugmented (reference data/component/ms_coco.py:
    # 15-21).  With augmentation disabled the train pixels are fixed too,
    # so BOTH frozen-teacher towers become per-sample constants and the
    # whole 12-layer ViT-B/32 teacher drops out of the step — the dominant
    # removable FLOP block (~39% of the live step's issued FLOPs at B=256).
    # Enabled by `augment_train: false` + `cached_image_teacher_reps` in
    # the COCO datamodule config; quality A/B vs the augmented baseline is
    # recorded in BENCH_NOTES (round 4).

    def loss_fn_cached_all(
        self, params, tokens, images, tea_text_rep, tea_image_rep, rng,
        deterministic,
    ):
        from distillclip_tpu.models import l2_normalize
        from distillclip_tpu.models.outputs import CLIPOutput, TextOutput, VisionOutput
        from distillclip_tpu.training.train_state import prepare_inputs

        fwd_rng, kd_rng = jax.random.split(rng)
        compute_params = cast_to_compute(params["student"], self._dtype)
        rngs = None
        if not deterministic:
            d, p = jax.random.split(fwd_rng)
            rngs = {"dropout": d, "droppath": p}
        imgs = prepare_inputs(images, self._dtype)
        stu_out = self.student.apply(
            {"params": compute_params}, tokens, imgs, self.flags,
            deterministic=deterministic, rngs=rngs,
        )
        text_rep = tea_text_rep.astype(self._dtype)
        image_rep = tea_image_rep.astype(self._dtype)
        # dummy [B,1,D] slices keep the pytree total; no-tap losses read
        # only last_representation (same contract as loss_fn_cached_text)
        tea_text = TextOutput(
            last_representation=text_rep, last_layer_output=text_rep[:, None, :]
        )
        tea_vis = VisionOutput(
            last_representation=image_rep, last_layer_output=image_rep[:, None, :]
        )
        logits = jnp.einsum(
            "id,td->it", l2_normalize(image_rep), l2_normalize(text_rep),
            preferred_element_type=jnp.float32,
        )
        tea_out = CLIPOutput(
            visual_output=tea_vis, text_output=tea_text,
            i2t_logits=logits, t2i_logits=logits.T,
        )
        tea_out = jax.lax.stop_gradient(tea_out)
        if self.norm:
            stu_out = norm_last_representation(stu_out)
            tea_out = norm_last_representation(tea_out)
        kd_vars = {"params": params["loss_aux"]} if self.loss_control.has_params else None
        loss, parts = self.loss_control(
            stu_out, tea_out, "all", vit_kd_variables=kd_vars, rng=kd_rng
        )
        return loss, (parts, stu_out, tea_out)

    def make_teacher_image_encode(self, mesh: Mesh) -> Callable:
        """Jitted teacher IMAGE encode for the fully-cached stage-3 path:
        images (sharded over data) -> fp32 last representations.  Only
        valid when train images are NOT augmented (fixed pixels)."""
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        teacher_vars = self.teacher_compute_vars

        def encode(images):
            from distillclip_tpu.training.train_state import prepare_inputs

            out = self.teacher.apply(
                teacher_vars, prepare_inputs(images, self._dtype),
                ControlFlags(), deterministic=True, method="encode_image",
            )
            return out.last_representation.astype(jnp.float32)

        return jax.jit(encode, in_shardings=(data,), out_shardings=repl)

    def make_teacher_text_encode(self, mesh: Mesh) -> Callable:
        """Jitted teacher TEXT encode for building stage-3 caption caches:
        tokens (sharded over data) -> fp32 last representations."""
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        teacher_vars = self.teacher_compute_vars

        def encode(tokens):
            out = self.teacher.apply(
                teacher_vars, tokens, ControlFlags(), deterministic=True,
                method="encode_text",
            )
            return out.last_representation.astype(jnp.float32)

        return jax.jit(encode, in_shardings=(data,), out_shardings=repl)

    def make_train_step(
        self, mesh: Mesh, tx, deterministic: bool = True, trainable_mask=None,
        cached_text_teacher: bool = False, cached_teachers: bool = False,
    ) -> Callable:
        if trainable_mask is None:
            trainable_mask = getattr(self, "_mask", None)
        elif trainable_mask is False:  # sentinel: explicitly unfrozen
            trainable_mask = None
        repl = replicated(mesh)
        data = batch_sharding(mesh)

        if cached_teachers:
            if self.flags.any_tap():
                raise ValueError(
                    "cached_teachers requires a loss config without teacher "
                    f"taps (per-layer losses); got flags {self.flags}."
                )

            def step_all_cached(
                state: TrainState, tokens, images, tea_text_rep,
                tea_image_rep, rng,
            ):
                rng = jax.random.fold_in(rng, state.step)
                (loss, (parts, _, _)), grads = jax.value_and_grad(
                    self.loss_fn_cached_all, has_aux=True
                )(
                    state.params, tokens, images, tea_text_rep, tea_image_rep,
                    rng, deterministic,
                )
                new_state = state.apply_gradients(grads, tx, trainable_mask)
                metrics = {"loss": loss, **parts}
                if self.log_grad_norm:
                    metrics["grad_norm"] = optax.global_norm(grads)
                return new_state, metrics

            return jax.jit(
                step_all_cached,
                in_shardings=(repl, data, data, data, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )

        if cached_text_teacher:
            if self.flags.any_tap():
                raise ValueError(
                    "cached_text_teacher requires a loss config without "
                    f"teacher taps (per-layer losses); got flags {self.flags}."
                )

            def step_cached(state: TrainState, teacher_vars, tokens, images, tea_text_rep, rng):
                rng = jax.random.fold_in(rng, state.step)
                (loss, (parts, _, _)), grads = jax.value_and_grad(
                    self.loss_fn_cached_text, has_aux=True
                )(
                    state.params, teacher_vars, tokens, images, tea_text_rep,
                    rng, deterministic,
                )
                new_state = state.apply_gradients(grads, tx, trainable_mask)
                metrics = {"loss": loss, **parts}
                if self.log_grad_norm:
                    metrics["grad_norm"] = optax.global_norm(grads)
                return new_state, metrics

            return jax.jit(
                step_cached,
                in_shardings=(repl, repl, data, data, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )

        def step(state: TrainState, teacher_vars, tokens, images, rng):
            rng = jax.random.fold_in(rng, state.step)
            (loss, (parts, _, _)), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, teacher_vars, tokens, images, rng, deterministic
            )
            new_state = state.apply_gradients(grads, tx, trainable_mask)
            metrics = {"loss": loss, **parts}
            if self.log_grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return jax.jit(
            step,
            in_shardings=(repl, repl, data, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def make_eval_step(self, mesh: Mesh) -> Callable:
        """Validation (dual_distill_model.py:131-150): loss + per-step acc on
        the GLOBAL batch + data-sharded reps for epoch-end retrieval (the
        host device_get assembles the corpus; see
        DistillTask.make_eval_step for why not a device all-gather)."""
        repl = replicated(mesh)
        data = batch_sharding(mesh)

        def step(state: TrainState, teacher_vars, tokens, images):
            rng = jax.random.PRNGKey(0)
            loss, (parts, stu_out, tea_out) = self.loss_fn(
                state.params, teacher_vars, tokens, images, rng, True
            )
            stu_logits = M.l2_normalize_f32(
                stu_out.visual_output.last_representation
            ) @ M.l2_normalize_f32(stu_out.text_output.last_representation).T
            tea_logits = M.l2_normalize_f32(
                tea_out.visual_output.last_representation
            ) @ M.l2_normalize_f32(tea_out.text_output.last_representation).T
            metrics = {"loss": loss, **parts}
            for k, v in M.topk_accuracy(stu_logits).items():
                metrics[f"stu_acc_top{k}"] = v
            for k, v in M.topk_accuracy(tea_logits).items():
                metrics[f"tea_acc_top{k}"] = v
            mean_score, softmax_score = M.diag_scores(stu_logits)
            metrics["stu_mean_score"] = mean_score
            metrics["stu_softmax_mean_score"] = softmax_score
            reps = {
                "stu_image_outs": stu_out.visual_output.last_representation.astype(jnp.float32),
                "stu_text_outs": stu_out.text_output.last_representation.astype(jnp.float32),
                "tea_image_outs": tea_out.visual_output.last_representation.astype(jnp.float32),
                "tea_text_outs": tea_out.text_output.last_representation.astype(jnp.float32),
            }
            return metrics, reps

        return jax.jit(
            step,
            in_shardings=(repl, repl, data, data),
            out_shardings=(repl, data),
        )
