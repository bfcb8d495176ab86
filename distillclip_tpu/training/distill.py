"""Single-tower distillation task (stage 1: image, stage 2: text).

TPU-native re-design of reference model/distil_model.py (DistillModel):
instead of a LightningModule with implicit DDP, the task builds ONE jitted
train step over a ``jax.sharding.Mesh``:

* batch sharded over the ``data`` axis, params/teacher replicated — XLA
  inserts the gradient all-reduce that DDP did (SURVEY.md §2.6),
* teacher forward inside the same step under ``stop_gradient`` (the
  reference runs it under no_grad in the same autograd graph,
  distil_model.py:84-85) so XLA overlaps student/teacher compute,
* bf16 compute via parameter casting at the step boundary with fp32 master
  weights (the reference's fp16 AMP, image.yaml:69),
* freeze/unfreeze as optax masks (distil_model.py:197-221 semantics),
  including the teacher-embedding copy of ``freeze_image_embedding``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

from distillclip_tpu.losses import LossCalculator
from distillclip_tpu.models import ControlFlags, l2_normalize
from distillclip_tpu.models.encoders import ImageEncoder
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


@dataclasses.dataclass
class DistillTask:
    """Owns modules, loss config and step compilation for one-tower distill.

    Constructor mirrors DistillModel.__init__ (distil_model.py:20-44).
    """

    student: Any  # flax module: RepeatVision/TextTransformer or Image/TextEncoder
    loss_control_para: Dict[str, Any]
    download_root: str = "./.cache"
    teacher_name: str = "ViT-B/32"
    freeze_embed: bool = False
    teacher_need_layers: Optional[Sequence[int]] = None
    model_type: str = "image"
    warm_steps: int = 10
    total_steps: int = 200
    weight_decay: float = 1e-3
    lr: float = 1e-3
    norm: bool = False
    unfreeze_epoch: Optional[int] = None
    # warm-start plain CLIP-architecture students from the teacher's blocks
    # (reference init_layers_with_teacher, image_encoder.py:70-97):
    # 'begin' | 'end' | 'mid'; step used by 'mid' (default tea_n // stu_n)
    teacher_init_type: Optional[str] = None
    teacher_init_step: Optional[int] = None
    compute_dtype: str = "bfloat16"
    grad_clip_norm: Optional[float] = None
    log_grad_norm: bool = False  # extra full-grad read per step; off like the reference
    # Lightning trainer.accumulate_grad_batches (l_clip.yaml:58); optimizer
    # updates fire every k micro-batches with the mean grad (optax.MultiSteps)
    accumulate_grad_batches: int = 1

    def __post_init__(self):
        if self.model_type not in ("text", "image"):
            raise ValueError(
                f"the model_type should in ['text', 'image'], but got {self.model_type}"
            )
        self.teacher, self.teacher_vars = teacher_load(
            self.teacher_name,
            self.download_root,
            self.model_type,
            need_layers=self.teacher_need_layers,
        )
        self.loss_control = LossCalculator(**self.loss_control_para)
        self.flags: ControlFlags = self.loss_control.control_flags()
        self._dtype = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
        self._teacher_compute_vars = None

        # student/teacher selected-layer alignment check (distil_model.py:52-57)
        if isinstance(self.student, ImageEncoder):
            tea = self.teacher.selected_layers
            stu = self.student.selected_layers
            if len(tea) != len(stu):
                raise ValueError(
                    f"teacher need_layers {tea} length != student need_layers {stu}"
                )

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_params(self, rng: Array, sample_inputs: Array) -> Dict[str, Any]:
        from distillclip_tpu.training.train_state import prepare_inputs

        sample_inputs = prepare_inputs(jnp.asarray(sample_inputs), self._dtype)
        s_rng, kd_rng = jax.random.split(rng)
        # init under jit: ONE compiled program instead of hundreds of eager
        # ops (each a network round-trip on tunneled backends, and an async
        # -dispatch flood that can starve in-flight collectives on 1-core
        # CPU hosts)
        variables = jax.jit(
            lambda r, x: self.student.init(
                {"params": r}, x, self.flags, deterministic=True
            )
        )(s_rng, sample_inputs)
        params = {"student": variables["params"]}
        if self.loss_control.has_params:
            stu_out = self.student.apply(variables, sample_inputs, self.flags)
            tea_out = self.teacher.apply(self.teacher_vars, sample_inputs, self.flags)
            kd_vars = self.loss_control.init_vit_kd(kd_rng, stu_out, tea_out)
            params["loss_aux"] = kd_vars["params"]
        if self.teacher_init_type is not None:
            params["student"] = self._warm_start_from_teacher(params["student"])
        if self.model_type == "image" and self.freeze_embed:
            params["student"] = self._copy_teacher_embeddings(params["student"])
        return params

    def _warm_start_from_teacher(self, student_params):
        """Teacher-block warm start (image_encoder.py:70-97 / text_encoder.py:124-152)."""
        from distillclip_tpu.models.teacher_init import init_layers_with_teacher

        scope = "visual" if self.model_type == "image" else "text"
        if scope not in student_params:
            raise ValueError(
                "teacher_init_type requires a plain CLIP-architecture student "
                f"(ImageEncoder/TextEncoder with a '{scope}' tower); got param "
                f"scopes {sorted(student_params)}"
            )
        sp = dict(student_params)
        sp[scope] = init_layers_with_teacher(
            sp[scope],
            self.teacher_vars["params"][scope],
            self.teacher_init_type,
            self.teacher_init_step,
        )
        # fresh buffers: leaves borrowed from teacher_vars must not alias the
        # donated train state (same reason as _copy_teacher_embeddings)
        return jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), sp)

    def _frozen_paths(self) -> List[str]:
        """Paths frozen by freeze_image_embedding (distil_model.py:203-221).

        Note the reference freezes the patch-embedding WEIGHT but not its
        bias; we match (patch_bias stays trainable).
        """
        if not (self.model_type == "image" and self.freeze_embed):
            return []
        if isinstance(self.student, RepeatVisionTransformer):
            return ["student/patch_kernel", "student/cls_token", "student/pos_embed"]
        if isinstance(self.student, ImageEncoder):
            return [
                "student/visual/patch_kernel",
                "student/visual/class_embedding",
                "student/visual/positional_embedding",
            ]
        return []

    def _copy_teacher_embeddings(self, student_params):
        """Teacher patch/cls/pos -> student (distil_model.py:197-221)."""
        tp = self.teacher_vars["params"]["visual"]
        # materialize fresh buffers: the student state is donated by the
        # jitted step while teacher_vars is a regular argument — aliasing
        # them trips XLA's donation checker (f(donate(a), a))
        copy = lambda x: jnp.array(x, copy=True)
        sp = dict(student_params)
        stu_kernel = (
            sp["patch_kernel"]
            if isinstance(self.student, RepeatVisionTransformer)
            else sp["visual"]["patch_kernel"]
        )
        if stu_kernel.shape != tp["patch_kernel"].shape:
            raise ValueError(
                "freeze_image_embedding copies the teacher's patch/cls/pos "
                "embeddings into the student, which requires matching patch "
                f"geometry: teacher patch_kernel {tuple(tp['patch_kernel'].shape)} "
                f"vs student {tuple(stu_kernel.shape)}. Match the student's "
                "img_size/patch_size/embed_dim to the teacher or disable "
                "freeze_embed."
            )
        if isinstance(self.student, RepeatVisionTransformer):
            sp["patch_kernel"] = copy(tp["patch_kernel"])
            sp["cls_token"] = copy(tp["class_embedding"][None, None, :])
            sp["pos_embed"] = copy(tp["positional_embedding"][None])
        elif isinstance(self.student, ImageEncoder):
            visual = dict(sp["visual"])
            visual["patch_kernel"] = copy(tp["patch_kernel"])
            visual["class_embedding"] = copy(tp["class_embedding"])
            visual["positional_embedding"] = copy(tp["positional_embedding"])
            sp["visual"] = visual
        return sp

    def make_optimizer(self, steps_per_epoch: int):
        """Cosine-warmup AdamW, schedule stepped per epoch
        (distil_model.py:160-169, main.py:15-21)."""
        k = max(1, int(self.accumulate_grad_batches or 1))
        # with accumulation the inner chain's count is optimizer UPDATES,
        # of which there are steps_per_epoch // k per epoch
        schedule = per_epoch(
            hf_cosine_with_warmup(self.lr, self.warm_steps, self.total_steps),
            max(1, steps_per_epoch // k),
        )
        self._lr_schedule = schedule  # the schedule the optimizer applies
        return make_optimizer(
            schedule,
            weight_decay=self.weight_decay,
            grad_clip_norm=self.grad_clip_norm,
            accumulate_steps=k,
        )

    def trainable_mask(self, params, frozen_embed: bool):
        frozen = self._frozen_paths() if frozen_embed else []
        return freeze_mask(params, frozen_paths=frozen) if frozen else None

    def init_state(
        self, rng: Array, sample_inputs: Array, steps_per_epoch: int, frozen_embed: bool = None
    ) -> Tuple[TrainState, optax.GradientTransformation]:
        params = self.init_params(rng, sample_inputs)
        if frozen_embed is None:
            frozen_embed = self.freeze_embed
        tx = self.make_optimizer(steps_per_epoch)
        self._mask = self.trainable_mask(params, frozen_embed)
        opt_state = tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=opt_state), tx

    # ------------------------------------------------------------------
    # forward + loss
    # ------------------------------------------------------------------

    @property
    def teacher_compute_vars(self):
        """Teacher variables pre-cast to the compute dtype, ONCE.

        The frozen teacher never changes, so casting fp32->bf16 inside the
        step (``_forward``) re-reads + re-writes every teacher weight each
        step (~0.9 GB/step for ViT-B/32).  Callers on the hot path should
        pass this instead of ``teacher_vars`` — the in-step cast then
        becomes a no-op.  ``teacher_vars`` itself stays fp32 (it seeds fp32
        master weights via freeze_embed/teacher warm start).
        """
        if self._teacher_compute_vars is None:
            self._teacher_compute_vars = jax.tree_util.tree_map(
                lambda x: x.astype(self._dtype)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.teacher_vars,
            )
        return self._teacher_compute_vars

    def _prepare_inputs(self, inputs):
        from distillclip_tpu.training.train_state import prepare_inputs

        return prepare_inputs(inputs, self._dtype)

    def _student_forward(self, params, inputs, rng, deterministic: bool):
        compute_params = cast_to_compute(params["student"], self._dtype)
        rngs = None
        if not deterministic:
            d_rng, p_rng = jax.random.split(rng)
            rngs = {"dropout": d_rng, "droppath": p_rng}
        x = self._prepare_inputs(inputs)
        stu_out = self.student.apply(
            {"params": compute_params}, x, self.flags, deterministic=deterministic, rngs=rngs
        )
        return stu_out, x

    def _forward(self, params, teacher_vars, inputs, rng, deterministic: bool):
        """Student + stop-grad teacher forward (distil_model.py:81-89)."""
        teacher_vars = jax.tree_util.tree_map(
            lambda x: x.astype(self._dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32
            else x,
            teacher_vars,
        )  # no-op when the caller passes teacher_compute_vars (pre-cast bf16)
        stu_out, x = self._student_forward(params, inputs, rng, deterministic)
        tea_out = self.teacher.apply(teacher_vars, x, self.flags, deterministic=True)
        tea_out = jax.lax.stop_gradient(tea_out)
        if self.norm:
            stu_out = stu_out.replace(
                last_representation=l2_normalize(stu_out.last_representation)
            )
            tea_out = tea_out.replace(
                last_representation=l2_normalize(tea_out.last_representation)
            )
        return stu_out, tea_out

    def loss_fn(self, params, teacher_vars, inputs, rng, deterministic: bool):
        fwd_rng, kd_rng = jax.random.split(rng)
        stu_out, tea_out = self._forward(params, teacher_vars, inputs, fwd_rng, deterministic)
        kd_vars = (
            {"params": params["loss_aux"]} if self.loss_control.has_params else None
        )
        loss, parts = self.loss_control(
            stu_out, tea_out, self.model_type, vit_kd_variables=kd_vars, rng=kd_rng
        )
        return loss, (parts, stu_out, tea_out)

    # -- cached frozen-teacher path (VERDICT r1 item 4) -----------------

    def _require_cacheable(self):
        """Taps force a live teacher: per-layer losses read teacher
        embeddings / attention / hidden states that depend on the input,
        so only all-false ControlFlags configs may use cached reps
        (the reference pre-encodes exactly these, e.g. val caches in
        data/component/combine_text_dataset.py:59-82)."""
        if self.flags.any_tap():
            raise ValueError(
                "cached_teacher requires a loss config without teacher taps "
                f"(per-layer losses); got flags {self.flags}. Run the live "
                "teacher for tap-dependent losses."
            )

    def _cached_teacher_output(self, tea_rep):
        """Build the teacher tower output from a precomputed representation.

        ``last_layer_output`` is never read by any one-tower loss when no
        taps are requested (losses/calculator.py one_tower); a dummy slice
        keeps the pytree total and is dead-code-eliminated by XLA.
        """
        from distillclip_tpu.models.outputs import TextOutput, VisionOutput

        rep = tea_rep.astype(self._dtype)
        cls = VisionOutput if self.model_type == "image" else TextOutput
        return cls(last_representation=rep, last_layer_output=rep[:, None, :])

    def loss_fn_cached(self, params, tea_rep, inputs, rng, deterministic: bool):
        fwd_rng, kd_rng = jax.random.split(rng)
        stu_out, _ = self._student_forward(params, inputs, fwd_rng, deterministic)
        tea_out = self._cached_teacher_output(tea_rep)
        if self.norm:
            stu_out = stu_out.replace(
                last_representation=l2_normalize(stu_out.last_representation)
            )
            tea_out = tea_out.replace(
                last_representation=l2_normalize(tea_out.last_representation)
            )
        kd_vars = (
            {"params": params["loss_aux"]} if self.loss_control.has_params else None
        )
        loss, parts = self.loss_control(
            stu_out, tea_out, self.model_type, vit_kd_variables=kd_vars, rng=kd_rng
        )
        return loss, (parts, stu_out, tea_out)

    def make_teacher_encode(self, mesh: Mesh) -> Callable:
        """Jitted teacher-encode for building train-rep caches:
        inputs (sharded over data) -> fp32 last representations."""
        repl = replicated(mesh)
        data = batch_sharding(mesh)
        teacher_vars = self.teacher_compute_vars

        def encode(inputs):
            x = self._prepare_inputs(inputs)
            out = self.teacher.apply(teacher_vars, x, ControlFlags(), deterministic=True)
            return out.last_representation.astype(jnp.float32)

        return jax.jit(encode, in_shardings=(data,), out_shardings=repl)

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def make_train_step(
        self, mesh: Mesh, tx, deterministic: bool = True, trainable_mask=None,
        cached_teacher: bool = False,
    ) -> Callable:
        """One optimizer step; batch sharded over data, state replicated.

        deterministic=True by default because every shipped config trains
        with zero dropout (image.yaml:16-19); pass False to enable the
        dropout/droppath rng streams.  ``trainable_mask`` defaults to the
        mask computed at init_state (freeze_embed semantics); pass an
        explicit None-mask step after ``unfreeze_epoch``.

        ``cached_teacher=True`` returns a step taking precomputed teacher
        representations instead of teacher variables —
        ``step(state, tea_rep, inputs, rng)`` — dropping the frozen teacher
        tower from the step entirely (stage-2 text inputs are fixed token
        tensors, so its outputs are constants; reference pre-encodes the
        same way for val, combine_text_dataset.py:59-82).  Requires a
        no-taps loss config.
        """
        if trainable_mask is None:
            trainable_mask = getattr(self, "_mask", None)
        elif trainable_mask is False:  # sentinel: explicitly unfrozen
            trainable_mask = None
        repl = replicated(mesh)
        data = batch_sharding(mesh)

        if cached_teacher:
            self._require_cacheable()

            def step(state: TrainState, tea_rep, inputs, rng):
                rng = jax.random.fold_in(rng, state.step)
                grad_fn = jax.value_and_grad(self.loss_fn_cached, has_aux=True)
                (loss, (parts, _, _)), grads = grad_fn(
                    state.params, tea_rep, inputs, rng, deterministic
                )
                new_state = state.apply_gradients(grads, tx, trainable_mask)
                metrics = {"loss": loss, **parts}
                if self.log_grad_norm:
                    metrics["grad_norm"] = optax.global_norm(grads)
                return new_state, metrics

            return jax.jit(
                step,
                in_shardings=(repl, data, data, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )

        def step(state: TrainState, teacher_vars, inputs, rng):
            rng = jax.random.fold_in(rng, state.step)
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (loss, (parts, _, _)), grads = grad_fn(
                state.params, teacher_vars, inputs, rng, deterministic
            )
            new_state = state.apply_gradients(grads, tx, trainable_mask)
            metrics = {"loss": loss, **parts}
            if self.log_grad_norm:
                metrics["grad_norm"] = optax.global_norm(grads)
            return new_state, metrics

        return jax.jit(
            step,
            in_shardings=(repl, repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def make_eval_step(self, mesh: Mesh) -> Callable:
        """Validation step (distil_model.py:104-129): loss + representations.

        Representations come back DATA-SHARDED; the epoch-end host
        ``device_get`` assembles the full corpus (the reference's explicit
        DDP ``self.all_gather``, distil_model.py:122-126, materialized on
        host instead).  A replicated out_sharding would insert a device
        all-gather whose result is immediately fetched anyway — wasted ICI
        bytes, and on 1-core CPU test hosts its 8-way rendezvous is the
        suite's main deadlock source.
        """
        repl = replicated(mesh)
        data = batch_sharding(mesh)

        def step(state: TrainState, teacher_vars, inputs, contrary_rep):
            rng = jax.random.PRNGKey(0)
            loss, (parts, stu_out, tea_out) = self.loss_fn(
                state.params, teacher_vars, inputs, rng, True
            )
            stu_logits, tea_logits = M.norm_and_logits(
                contrary_rep,
                stu_out.last_representation,
                tea_out.last_representation,
            )[:2]
            metrics = {"loss": loss, **parts}
            for k, v in M.topk_accuracy(stu_logits).items():
                metrics[f"stu_acc_top{k}"] = v
            for k, v in M.topk_accuracy(tea_logits).items():
                metrics[f"tea_acc_top{k}"] = v
            mean_score, softmax_score = M.diag_scores(stu_logits)
            metrics["stu_mean_score"] = mean_score
            metrics["stu_softmax_mean_score"] = softmax_score
            return metrics, {
                "student": stu_out.last_representation.astype(jnp.float32),
                "teacher": tea_out.last_representation.astype(jnp.float32),
                "contrary_rep": contrary_rep.astype(jnp.float32),
            }

        return jax.jit(
            step,
            in_shardings=(repl, repl, data, data),
            out_shardings=(repl, data),
        )
