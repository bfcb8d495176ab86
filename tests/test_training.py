"""Training system tests on the 8-device virtual CPU mesh.

The minimum end-to-end slice (SURVEY.md §7 step 4): text distillation
against a fabricated CLIP teacher, jitted and sharded over the data axis —
loss must be finite and DECREASE over a few steps.
"""

import math

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from distillclip_tpu.models import RepeatTextTransformer, RepeatVisionTransformer
from distillclip_tpu.parallel import create_mesh, shard_batch
from distillclip_tpu.training import (
    DistillTask,
    DualDistillTask,
    freeze_mask,
    hf_cosine_with_warmup,
    restore_tower_params,
    save_pytree,
)

from test_teacher import _make_state_dict, CTX, OUT, RES, VOCAB, PATCH


@pytest.fixture(scope="module")
def ckpt_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("ckpt") / "tiny_clip.pt"
    torch.save(_make_state_dict(), str(path))
    return str(path)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() == 8, "conftest must provide 8 virtual devices"
    return create_mesh()


def _text_task(ckpt_path, **over):
    student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2, use_transform=True,
        compression_embedding=True, embedding_compression_dim=16,
    )
    kwargs = dict(
        student=student,
        loss_control_para={"loss_name": ["out_l1", "out_cos"]},
        teacher_name=ckpt_path,
        model_type="text",
        lr=1e-2,
        warm_steps=1,
        total_steps=10,
    )
    kwargs.update(over)
    return DistillTask(**kwargs)


def test_schedule_matches_hf():
    """Our schedule vs transformers.get_cosine_schedule_with_warmup."""
    import torch
    from transformers import get_cosine_schedule_with_warmup

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=1.0)
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=10, num_training_steps=200)
    ours = hf_cosine_with_warmup(1.0, 10, 200)
    for epoch in [0, 1, 5, 9, 10, 50, 100, 150, 199, 200]:
        expected = sched.lr_lambdas[0](epoch)
        np.testing.assert_allclose(float(ours(epoch)), expected, rtol=1e-5, atol=1e-6)


def test_text_distill_loss_decreases(ckpt_path, mesh):
    task = _text_task(ckpt_path)
    rng = jax.random.PRNGKey(0)
    B = 16
    tokens = np.random.default_rng(0).integers(1, VOCAB - 1, size=(B, CTX))
    tokens[:, -1] = VOCAB - 1
    tokens = jnp.asarray(tokens)

    state, tx = task.init_state(rng, tokens[:1], steps_per_epoch=2)
    step = task.make_train_step(mesh, tx)
    batch = shard_batch(mesh, tokens)
    losses = []
    for i in range(6):
        state, metrics = step(state, task.teacher_vars, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"


def test_text_eval_step(ckpt_path, mesh):
    task = _text_task(ckpt_path)
    rng = jax.random.PRNGKey(0)
    B = 16
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, VOCAB, size=(B, CTX)))
    contrary = jnp.asarray(np.random.default_rng(1).normal(size=(B, 48)), jnp.float32)
    state, tx = task.init_state(rng, tokens[:1], steps_per_epoch=2)
    eval_step = task.make_eval_step(mesh)
    metrics, reps = eval_step(state, task.teacher_vars, shard_batch(mesh, tokens),
                              shard_batch(mesh, contrary))
    assert 0.0 <= float(metrics["stu_acc_top1"]) <= 1.0
    assert float(metrics["stu_acc_top10"]) >= float(metrics["stu_acc_top1"])
    assert reps["student"].shape == (B, 48)


def test_image_freeze_embed(ckpt_path, mesh):
    """freeze_image_embedding: teacher embeddings copied in and not updated."""
    student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=64, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True, use_transform=True,
    )
    task = DistillTask(
        student=student,
        loss_control_para={"loss_name": ["out_l1", "out_cos"]},
        teacher_name=ckpt_path,
        model_type="image",
        freeze_embed=True,
        lr=1e-2, warm_steps=1, total_steps=10,
    )
    rng = jax.random.PRNGKey(0)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(16, RES, RES, 3)), jnp.float32)
    state, tx = task.init_state(rng, imgs[:1], steps_per_epoch=2)

    tea_patch = np.asarray(task.teacher_vars["params"]["visual"]["patch_kernel"])
    np.testing.assert_array_equal(np.asarray(state.params["student"]["patch_kernel"]), tea_patch)

    step = task.make_train_step(mesh, tx)
    batch = shard_batch(mesh, imgs)
    state2, metrics = step(state, task.teacher_vars, batch, rng)
    # frozen embeddings unchanged, other params changed
    np.testing.assert_array_equal(np.asarray(state2.params["student"]["patch_kernel"]), tea_patch)
    qkv_before = np.asarray(
        jax.tree_util.tree_leaves(state.params)[0]
    ) if False else None
    assert not np.allclose(
        np.asarray(state2.params["student"]["blocks_0"]["attn"]["qkv"]["kernel"]),
        np.asarray(jnp.zeros_like(state2.params["student"]["blocks_0"]["attn"]["qkv"]["kernel"])),
    )
    # patch BIAS must remain trainable (reference freezes only the weight)
    assert float(metrics["loss"]) > 0


def test_dual_task_with_checkpoint_composition(ckpt_path, mesh, tmp_path):
    """Stage-3 warm start: save stage-like checkpoints, compose, train."""
    img_student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    txt_student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    )
    rng = jax.random.PRNGKey(1)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(16, RES, RES, 3)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, VOCAB, size=(16, CTX)))

    # fabricate stage-1/2 checkpoints in our stage format
    flags_probe = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                           "loss_scale": {"cos_diff": 0.1}},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=10,
    )
    base_params = flags_probe.init_params(rng, toks[:1], imgs[:1])
    img_ckpt = str(tmp_path / "image_stage")
    txt_ckpt = str(tmp_path / "text_stage")
    save_pytree(img_ckpt, {"params": {"student": base_params["student"]["image_tower"]}})
    save_pytree(txt_ckpt, {"params": {"student": base_params["student"]["text_tower"]}})

    task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                           "loss_scale": {"cos_diff": 0.1}},
        teacher_name=ckpt_path,
        load_path={"image": img_ckpt, "text": txt_ckpt},
        freeze_prefix=["image_tower.patch_kernel"],
        lr=1e-3, warm_steps=1, total_steps=10,
    )
    state, tx = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    # warm start took effect
    np.testing.assert_array_equal(
        np.asarray(state.params["student"]["image_tower"]["cls_token"]),
        np.asarray(base_params["student"]["image_tower"]["cls_token"]),
    )
    step = task.make_train_step(mesh, tx)
    frozen_before = np.asarray(state.params["student"]["image_tower"]["patch_kernel"])
    state, metrics = step(state, task.teacher_vars, shard_batch(mesh, toks),
                          shard_batch(mesh, imgs), rng)
    assert np.isfinite(float(metrics["loss"]))
    assert "image_out_l1" in metrics and "cos_diff" in metrics
    np.testing.assert_array_equal(
        np.asarray(state.params["student"]["image_tower"]["patch_kernel"]), frozen_before
    )

    eval_step = task.make_eval_step(mesh)
    m, reps = eval_step(state, task.teacher_vars, shard_batch(mesh, toks), shard_batch(mesh, imgs))
    assert reps["stu_image_outs"].shape == (16, 48)
    jax.device_get((m, reps))  # fence: don't leave the 8-way eval in flight


def test_freeze_mask_paths():
    params = {"a": {"b": jnp.zeros(2), "c": jnp.zeros(2)}, "d": jnp.zeros(2)}
    mask = freeze_mask(params, frozen_paths=["a/b"], frozen_prefixes=["d"])
    assert mask == {"a": {"b": False, "c": True}, "d": False}


def test_stream_loader_schedule_recalibration(ckpt_path, tmp_path):
    """__len__-less loaders: the provisional schedule length is replaced by
    the measured epoch-0 count (VERDICT r1 weak #4); lr is logged from the
    schedule the optimizer applies."""
    import json
    from distillclip_tpu.training.trainer import Trainer

    N_BATCHES, BATCH = 5, 8

    class StreamDM:
        def prepare_data(self):
            pass

        def setup(self, stage=None):
            pass

        def train_dataloader(self, epoch=0):
            rng = np.random.default_rng(epoch)
            def gen():
                for _ in range(N_BATCHES):
                    yield {"inputs": rng.integers(0, VOCAB, size=(BATCH, CTX))}
            return gen()

        def val_dataloader(self):
            rng = np.random.default_rng(99)
            def gen():
                for _ in range(2):
                    yield {"inputs": rng.integers(0, VOCAB, size=(BATCH, CTX)),
                           "contrary": rng.normal(size=(BATCH, 48)).astype(np.float32)}
            return gen()

    task = _text_task(ckpt_path, total_steps=4, warm_steps=1)
    trainer = Trainer(max_epochs=2, result_dir=str(tmp_path), run_name="stream",
                      log_every_n_steps=1)
    trainer.fit(task, StreamDM())

    lines = [json.loads(l) for l in open(tmp_path / "stream" / "metrics.jsonl")]
    recal = [d for d in lines if "perf/steps_per_epoch_recalibrated" in d]
    assert recal and recal[0]["perf/steps_per_epoch_recalibrated"] == N_BATCHES
    # lr comes from the per-step schedule: with steps_per_epoch=5 the epoch-1
    # lr (steps 5..9) must match hf_cosine(epoch=1), not the provisional pacing
    lrs = [(d["step"], d["lr"]) for d in lines if "lr" in d and d.get("epoch") == 1]
    assert lrs, "no epoch-1 lr logged"
    expected = hf_cosine_with_warmup(task.lr, task.warm_steps, task.total_steps)(1)
    assert abs(lrs[0][1] - expected) < 1e-9


def test_declared_steps_per_epoch_used(ckpt_path, tmp_path):
    """A datamodule-declared steps_per_epoch() fixes the schedule length up
    front (reference dataset_size // batch, text_image_datamodule.py:80)."""
    import json
    from distillclip_tpu.training.trainer import Trainer

    class DeclaredDM:
        def prepare_data(self):
            pass

        def setup(self, stage=None):
            pass

        def steps_per_epoch(self):
            return 3

        def train_dataloader(self, epoch=0):
            rng = np.random.default_rng(epoch)
            def gen():
                for _ in range(3):
                    yield {"inputs": rng.integers(0, VOCAB, size=(8, CTX))}
            return gen()

        def val_dataloader(self):
            def gen():
                rng = np.random.default_rng(99)
                yield {"inputs": rng.integers(0, VOCAB, size=(8, CTX)),
                       "contrary": rng.normal(size=(8, 48)).astype(np.float32)}
            return gen()

    task = _text_task(ckpt_path, total_steps=4, warm_steps=1)
    trainer = Trainer(max_epochs=1, result_dir=str(tmp_path), run_name="declared",
                      log_every_n_steps=1)
    trainer.fit(task, DeclaredDM())
    lines = [json.loads(l) for l in open(tmp_path / "declared" / "metrics.jsonl")]
    assert not any("perf/steps_per_epoch_recalibrated" in d for d in lines)
    hp = json.load(open(tmp_path / "declared" / "hparams.json"))
    assert hp["steps_per_epoch"] == 3


# ---------------------------------------------------------------------------
# cached frozen-teacher path (VERDICT r1 item 4)
# ---------------------------------------------------------------------------


def test_cached_teacher_step_matches_live(ckpt_path, mesh):
    """Precomputed teacher reps must reproduce the live-teacher loss: the
    rep round-trips bf16 -> f32 cache -> bf16 exactly."""
    task = _text_task(ckpt_path)
    rng = jax.random.PRNGKey(0)
    B = 16
    tokens = np.random.default_rng(0).integers(1, VOCAB - 1, size=(B, CTX))
    tokens[:, -1] = VOCAB - 1
    batch = shard_batch(mesh, jnp.asarray(tokens))
    tea_rep = task.make_teacher_encode(mesh)(batch)
    assert tea_rep.shape == (B, OUT) and tea_rep.dtype == jnp.float32

    state, tx = task.init_state(rng, jnp.asarray(tokens[:1]), steps_per_epoch=2)
    live = task.make_train_step(mesh, tx)
    _, m_live = live(state, task.teacher_compute_vars, batch, rng)

    state2, tx2 = task.init_state(rng, jnp.asarray(tokens[:1]), steps_per_epoch=2)
    cached = task.make_train_step(mesh, tx2, cached_teacher=True)
    state2, m_cached = cached(state2, shard_batch(mesh, tea_rep), batch, rng)
    np.testing.assert_allclose(
        float(m_live["loss"]), float(m_cached["loss"]), rtol=1e-2
    )
    # and the cached step trains
    losses = [float(m_cached["loss"])]
    for _ in range(5):
        state2, m_cached = cached(state2, shard_batch(mesh, tea_rep), batch, rng)
        losses.append(float(m_cached["loss"]))
    assert losses[-1] < losses[0], f"cached-teacher loss did not decrease: {losses}"


def test_cached_teacher_rejects_taps(ckpt_path, mesh):
    """Per-layer losses read input-dependent teacher internals: caching must
    refuse (taps force a live teacher)."""
    task = _text_task(
        ckpt_path,
        loss_control_para={"loss_name": ["out_l1", "hidden_rep_mse"]},
        teacher_need_layers=[0, 1],
    )
    tx = task.make_optimizer(2)
    with pytest.raises(ValueError, match="cached_teacher"):
        task.make_train_step(mesh, tx, cached_teacher=True)


def test_dual_cached_text_teacher_matches_live(ckpt_path, mesh):
    """Stage-3: cached teacher TEXT reps + live teacher image tower must
    reproduce the live two-tower loss (incl. teacher contrastive logits)."""
    img_student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    txt_student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    )
    task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                           "loss_scale": {"cos_diff": 0.1}},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=10,
    )
    rng = jax.random.PRNGKey(1)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(16, RES, RES, 3)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, VOCAB, size=(16, CTX)))
    b_toks, b_imgs = shard_batch(mesh, toks), shard_batch(mesh, imgs)

    text_rep = task.make_teacher_text_encode(mesh)(b_toks)
    assert text_rep.shape == (16, 48)

    state, tx = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    live = task.make_train_step(mesh, tx)
    _, m_live = live(state, task.teacher_compute_vars, b_toks, b_imgs, rng)

    state2, tx2 = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    cached = task.make_train_step(mesh, tx2, cached_text_teacher=True)
    _, m_cached = cached(
        state2, task.teacher_compute_vars, b_toks, b_imgs,
        shard_batch(mesh, text_rep), rng,
    )
    np.testing.assert_allclose(
        float(m_live["loss"]), float(m_cached["loss"]), rtol=1e-2
    )
    # the image-text loss (teacher logits) must match too, not just one-tower
    np.testing.assert_allclose(
        float(m_live["cos_diff"]), float(m_cached["cos_diff"]), rtol=2e-2, atol=1e-4
    )


def test_combine_text_dataset_cached_reps(tmp_path):
    from distillclip_tpu.data.component import combine_text_dataset as ctd

    tokens = np.arange(10 * CTX, dtype=np.int32).reshape(10, CTX) % VOCAB
    reps = np.random.default_rng(0).normal(size=(10, 8)).astype(np.float32)
    np.savez(ctd._train_cache(tmp_path, "T"), tokens=tokens)
    np.savez(ctd._train_rep_cache(tmp_path, "T"), train_rep=reps)
    ds = ctd.CombineTextDataset(
        cache_dir=str(tmp_path), train=True, teacher_name="T",
        cached_teacher_reps=True,
    )
    item = ds[3]
    np.testing.assert_array_equal(item["inputs"], tokens[3])
    np.testing.assert_array_equal(item["tea_rep"], reps[3])
    # without the flag: no rep key
    assert "tea_rep" not in ctd.CombineTextDataset(
        cache_dir=str(tmp_path), train=True, teacher_name="T"
    )[0]
    # row-count mismatch is an error
    np.savez(ctd._train_rep_cache(tmp_path, "T"), train_rep=reps[:5])
    with pytest.raises(ValueError, match="re-run prepare"):
        ctd.CombineTextDataset(cache_dir=str(tmp_path), train=True,
                               teacher_name="T", cached_teacher_reps=True)


def test_trainer_fit_with_cached_teacher_batches(ckpt_path, tmp_path):
    """Trainer auto-selects the cached step when batches carry 'tea_rep'."""
    import json
    from distillclip_tpu.training.trainer import Trainer

    B = 8
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, VOCAB - 1, size=(4 * B, CTX)).astype(np.int32)
    reps = rng.normal(size=(4 * B, OUT)).astype(np.float32)

    class CachedDM:
        def prepare_data(self):
            pass

        def setup(self, stage=None):
            pass

        def train_dataloader(self, epoch=0):
            def gen():
                for i in range(4):
                    yield {"inputs": tokens[i * B:(i + 1) * B],
                           "tea_rep": reps[i * B:(i + 1) * B]}
            return gen()

        def val_dataloader(self):
            def gen():
                yield {"inputs": tokens[:B],
                       "contrary": rng.normal(size=(B, OUT)).astype(np.float32)}
            return gen()

    task = _text_task(ckpt_path, total_steps=4, warm_steps=1)
    trainer = Trainer(max_epochs=1, result_dir=str(tmp_path), run_name="cached",
                      log_every_n_steps=1)
    trainer.fit(task, CachedDM())
    lines = [json.loads(l) for l in open(tmp_path / "cached" / "metrics.jsonl")]
    assert any("train_loss/loss" in d for d in lines)
    assert any("val_loss/loss" in d for d in lines)


def test_uint8_device_normalize_matches_float(ckpt_path, mesh):
    """uint8 inputs + on-device normalization must reproduce the
    host-normalized float path (4x-less-transfer pipeline)."""
    from distillclip_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD

    student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    task = DistillTask(
        student=student,
        loss_control_para={"loss_name": ["out_l1", "out_cos"]},
        teacher_name=ckpt_path, model_type="image",
        lr=1e-2, warm_steps=1, total_steps=10,
    )
    rng = jax.random.PRNGKey(0)
    u8 = np.random.default_rng(0).integers(0, 256, size=(16, RES, RES, 3)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0) - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )

    state, tx = task.init_state(rng, jnp.asarray(u8[:1]), steps_per_epoch=2)
    step = task.make_train_step(mesh, tx)
    _, m_u8 = step(state, task.teacher_compute_vars, shard_batch(mesh, jnp.asarray(u8)), rng)

    state2, tx2 = task.init_state(rng, jnp.asarray(f32[:1]), steps_per_epoch=2)
    step2 = task.make_train_step(mesh, tx2)
    _, m_f32 = step2(state2, task.teacher_compute_vars, shard_batch(mesh, jnp.asarray(f32)), rng)

    np.testing.assert_allclose(float(m_u8["loss"]), float(m_f32["loss"]), rtol=1e-3)


def test_ln_fusion_training_trajectory_matches(ckpt_path, mesh, monkeypatch):
    """LN-fused kernels (norm1->qkv, norm2->fc1) produce the same training
    trajectory as the standalone-LN path — catches grad bugs in the fused
    custom VJPs at the full train-step level, not just per-op oracles."""

    def run(ln_fused: bool):
        monkeypatch.setenv("DISTILLCLIP_FC1_LN", "1" if ln_fused else "0")
        task = _text_task(ckpt_path)
        rng = jax.random.PRNGKey(0)
        B = 16
        tokens = np.random.default_rng(0).integers(1, VOCAB - 1, size=(B, CTX))
        tokens[:, -1] = VOCAB - 1
        tokens = jnp.asarray(tokens)
        state, tx = task.init_state(rng, tokens[:1], steps_per_epoch=2)
        step = task.make_train_step(mesh, tx)
        batch = shard_batch(mesh, tokens)
        losses = []
        for _ in range(3):
            state, metrics = step(state, task.teacher_vars, batch, rng)
            losses.append(float(metrics["loss"]))
        return losses

    fused = run(True)
    plain = run(False)
    np.testing.assert_allclose(fused, plain, rtol=2e-3, atol=2e-4)


def test_dual_fine_grain_step(ckpt_path, mesh):
    """fine_grain (the only last_layer_output consumer) trains end-to-end:
    need_last_layer=True forces the full-sequence tower tails."""
    img_student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    txt_student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    )
    task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "fine_grain"],
                           "loss_scale": {"fine_grain": 0.1}},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=10,
    )
    assert task.flags.need_last_layer
    rng = jax.random.PRNGKey(2)
    imgs = jnp.asarray(np.random.default_rng(1).normal(size=(16, RES, RES, 3)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(1).integers(1, VOCAB, size=(16, CTX)))
    state, tx = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    step = task.make_train_step(mesh, tx)
    state, metrics = step(state, task.teacher_vars, shard_batch(mesh, toks),
                          shard_batch(mesh, imgs), rng)
    assert np.isfinite(float(metrics["loss"]))
    assert "fine_grain" in metrics


@pytest.mark.quick
def test_accumulate_grad_batches_matches_mean_grad():
    """accumulate_grad_batches=k (optax.MultiSteps wrap): no param change on
    the first k-1 micro-steps, then one update equal to a single step on the
    MEAN of the k micro-grads (Lightning semantics; the reference ships
    accumulate_grad_batches: 1 in l_clip.yaml:58 but the trainer surface
    supports >1)."""
    from distillclip_tpu.training.train_state import TrainState, make_optimizer

    params = {"w": jnp.ones((4, 4), jnp.float32), "b": jnp.zeros((4,), jnp.float32)}
    g1 = {"w": jnp.full((4, 4), 0.5), "b": jnp.full((4,), -1.0)}
    g2 = {"w": jnp.full((4, 4), -0.25), "b": jnp.full((4,), 3.0)}
    mean_g = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g1, g2)

    tx_acc = make_optimizer(lambda _: 1e-2, weight_decay=1e-3, accumulate_steps=2)
    st = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                    opt_state=tx_acc.init(params))
    st = st.apply_gradients(g1, tx_acc)
    np.testing.assert_array_equal(np.asarray(st.params["w"]), np.asarray(params["w"]))
    st = st.apply_gradients(g2, tx_acc)

    tx_ref = make_optimizer(lambda _: 1e-2, weight_decay=1e-3)
    st_ref = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                        opt_state=tx_ref.init(params))
    st_ref = st_ref.apply_gradients(mean_g, tx_ref)

    np.testing.assert_allclose(
        np.asarray(st.params["w"]), np.asarray(st_ref.params["w"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st.params["b"]), np.asarray(st_ref.params["b"]), rtol=1e-6)


@pytest.mark.quick
def test_accumulate_schedule_paced_in_updates(ckpt_path):
    """The cosine schedule must advance per optimizer UPDATE: with k=2 and
    10 loader steps/epoch, the epoch boundary sits at update 5."""
    task = _text_task(ckpt_path, accumulate_grad_batches=2, warm_steps=0,
                      total_steps=4, lr=1e-2)
    task.make_optimizer(steps_per_epoch=10)
    sched = task._lr_schedule
    # epoch 0 covers updates 0..4, epoch 1 starts at update 5
    assert float(sched(0)) == float(sched(4))
    assert float(sched(5)) < float(sched(4))


@pytest.mark.quick
def test_lr_finder_suggestion_rule():
    """suggest_from_history picks the lr at the steepest smoothed descent
    (Lightning auto_lr_find rule; reference emits auto_lr_find templates,
    sh/gene_template.py:104)."""
    from distillclip_tpu.tools.lr_finder import (
        exponential_sweep, suggest_from_history,
    )

    sched = exponential_sweep(1e-6, 1.0, 100)
    assert float(sched(0)) == pytest.approx(1e-6)
    assert float(sched(99)) == pytest.approx(1.0)
    lrs = [float(sched(i)) for i in range(100)]
    # flat -> steep descent (idx 40-60) -> blow-up
    losses = [2.0] * 40 + [2.0 - 0.15 * i for i in range(20)] + [
        5.0 + i for i in range(40)]
    s = suggest_from_history(lrs, losses)
    assert lrs[35] <= s <= lrs[75]  # inside/near the descent region

    # diverged sweep: NaN/inf tail entries must be dropped before smoothing
    # so the suggestion stays in the descent region instead of landing at
    # the divergence lr (advisor r4)
    nan_losses = losses[:80] + [float("nan")] * 10 + [float("inf")] * 10
    s_nan = suggest_from_history(lrs, nan_losses)
    assert s_nan is not None and math.isfinite(s_nan)
    assert lrs[35] <= s_nan <= lrs[79]
    assert suggest_from_history(lrs, [float("nan")] * 100) is None


def test_lr_find_runs_on_tiny_task(ckpt_path):
    """End-to-end range test on the tiny text stage: records a monotone lr
    sweep with finite losses and returns a suggestion (or flags
    divergence)."""
    from distillclip_tpu.tools.lr_finder import lr_find

    task = _text_task(ckpt_path)

    class _DM:
        def prepare_data(self):
            pass

        def setup(self, stage):
            pass

        def train_dataloader(self):
            rng = np.random.default_rng(0)
            toks = rng.integers(1, VOCAB - 2, size=(64, CTX)).astype(np.int32)
            toks[:, -1] = VOCAB - 1
            return [{"inputs": toks[i * 8:(i + 1) * 8]} for i in range(8)]

    res = lr_find(task, _DM(), min_lr=1e-5, max_lr=0.5, num_steps=16)
    assert len(res["lrs"]) >= 8
    assert res["lrs"] == sorted(res["lrs"])  # exponential sweep is monotone
    assert all(np.isfinite(l) for l in res["losses"][:4])
    assert res["suggestion"] is None or res["suggestion"] > 0


def test_dual_fully_cached_teachers_matches_live(ckpt_path, mesh):
    """Stage-3 FLOP lever: with augmentation off, BOTH frozen-teacher
    towers' reps are per-sample constants; the fully-cached step must
    reproduce the live two-tower loss (documented deviation — reference
    keeps the image teacher live only because of RandAugment,
    ms_coco.py:15-21)."""
    img_student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    txt_student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    )
    task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                           "loss_scale": {"cos_diff": 0.1}},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=10,
    )
    rng = jax.random.PRNGKey(1)
    imgs = jnp.asarray(np.random.default_rng(0).normal(size=(16, RES, RES, 3)), jnp.float32)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, VOCAB, size=(16, CTX)))
    b_toks, b_imgs = shard_batch(mesh, toks), shard_batch(mesh, imgs)

    text_rep = task.make_teacher_text_encode(mesh)(b_toks)
    image_rep = task.make_teacher_image_encode(mesh)(b_imgs)
    assert image_rep.shape == (16, 48)

    state, tx = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    live = task.make_train_step(mesh, tx)
    _, m_live = live(state, task.teacher_compute_vars, b_toks, b_imgs, rng)

    state2, tx2 = task.init_state(rng, toks[:1], imgs[:1], steps_per_epoch=2)
    cached = task.make_train_step(mesh, tx2, cached_teachers=True)
    _, m_cached = cached(
        state2, b_toks, b_imgs,
        shard_batch(mesh, text_rep), shard_batch(mesh, image_rep), rng,
    )
    np.testing.assert_allclose(
        float(m_live["loss"]), float(m_cached["loss"]), rtol=1e-2
    )
    np.testing.assert_allclose(
        float(m_live["cos_diff"]), float(m_cached["cos_diff"]), rtol=2e-2, atol=1e-4
    )

    # tap configs must refuse the cached path
    tap_task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["attention_score_mse"]},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=10,
    )
    with pytest.raises(ValueError, match="cached_teachers"):
        tap_task.make_train_step(mesh, tx, cached_teachers=True)


def test_coco_fully_cached_pipeline_end_to_end(ckpt_path, tmp_path):
    """Fabricated tiny COCO corpus -> prepare (caption + image rep caches,
    tiny teacher) -> COCODataset(augment_train=False, both caches) ->
    trainer auto-selects the fully-cached dual step ('tea_img_rep' in the
    batch) and fits.  Covers the whole no-augment deviation pipeline
    (BASELINE.md north-star analysis)."""
    import json as _json

    from distillclip_tpu.data.datamodule import MainDataModule
    from distillclip_tpu.tools.fabricate_images import (
        fabricate, fabricate_coco_train,
    )
    from distillclip_tpu.training.trainer import Trainer

    corpus = str(tmp_path / "corpus")
    fabricate(corpus, n_train=0, n_val=16, size=RES)
    fabricate_coco_train(corpus, n_train=32, size=RES)

    dm = MainDataModule(
        dataset="ms_coco",
        dataset_name="COCODataset",
        prepare_para={"cache_caption_reps": True, "cache_image_reps": True},
        dataset_para={
            "root_path": f"{corpus}/mscoco",
            "annotation_path": f"{corpus}/mscoco/annotations",
            "image_size": RES,
            "context_length": CTX,
            "cached_text_teacher_reps": True,
            "cached_image_teacher_reps": True,
            "augment_train": False,
            "cache_dir": str(tmp_path / "cache"),
            "teacher_name": ckpt_path,
            "download_root": str(tmp_path / "cache"),
        },
        train_batch_size=8,
        val_batch_size=8,
        num_workers=0,
    )
    img_student = RepeatVisionTransformer(
        img_size=RES, patch_size=PATCH, out_dim=48, embed_dim=32, depth=2,
        num_heads=4, repeated_times=2, qkv_bias=True,
    )
    txt_student = RepeatTextTransformer(
        vocab_size=VOCAB, context_length=CTX, out_dim=48, embed_dim=32,
        depth=2, num_heads=4, repeated_times=2,
    )
    task = DualDistillTask(
        image_student=img_student, text_student=txt_student,
        loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                           "loss_scale": {"cos_diff": 0.1}},
        teacher_name=ckpt_path, lr=1e-3, warm_steps=1, total_steps=4,
    )
    trainer = Trainer(max_epochs=1, result_dir=str(tmp_path), run_name="cocoab",
                      log_every_n_steps=1, limit_val_batches=1)
    trainer.fit(task, dm)
    lines = [_json.loads(l) for l in open(tmp_path / "cocoab" / "metrics.jsonl")]
    assert any("train_loss/loss" in d for d in lines)

    # dataset items carry BOTH cached rep kinds
    item = dm.trainset[0]
    assert item["tea_rep"].shape == (OUT,)
    assert item["tea_img_rep"].shape == (OUT,)

    # RandAugment + cached image reps must refuse to combine
    from distillclip_tpu.data.component.ms_coco import COCODataset

    with pytest.raises(ValueError, match="augment_train"):
        COCODataset(
            root_path=f"{corpus}/mscoco",
            annotation_path=f"{corpus}/mscoco/annotations",
            image_size=RES, context_length=CTX,
            cached_image_teacher_reps=True, augment_train=True,
            cache_dir=str(tmp_path / "cache"), teacher_name=ckpt_path,
        )


def test_image_cached_pipeline_end_to_end(ckpt_path, tmp_path):
    """Stage-1 FLOP lever (configs/final/image_allcached.yaml): fabricated
    combined folder -> prepare (cache_train_image_reps pre-encodes train
    images) -> CombineImageDataset(augment_train=False,
    cached_teacher_reps=True) -> trainer auto-selects the cached-teacher
    single-tower step ('tea_rep' in the batch) and fits."""
    import json as _json

    from distillclip_tpu.data.datamodule import MainDataModule
    from distillclip_tpu.tools.fabricate_images import fabricate
    from distillclip_tpu.training.trainer import Trainer

    corpus = str(tmp_path / "corpus")
    fabricate(corpus, n_train=32, n_val=16, size=RES)

    # the overlay scenario (reviewer r5): prepare ran ONCE for the live
    # config (val cache exists), then the allcached overlay's prepare must
    # still build the train-rep cache — no early return past it
    from distillclip_tpu.data.component.combine_image_dataset import (
        prepare as img_prepare,
    )

    img_prepare({
        "raw_data_dir": corpus, "cache_dir": str(tmp_path / "cache"),
        "teacher_name": ckpt_path, "download_root": str(tmp_path / "cache"),
        "combine_dataset_path": f"{corpus}/combined",
    })

    dm = MainDataModule(
        dataset="combine_image_dataset",
        dataset_name="CombineImageDataset",
        prepare_para={"raw_data_dir": corpus, "cache_train_image_reps": True},
        dataset_para={
            "combine_dataset_path": f"{corpus}/combined",
            "image_use": ["coco", "imagenet"],
            "image_size": RES,
            "augment_train": False,
            "cached_teacher_reps": True,
            "cache_dir": str(tmp_path / "cache"),
            "teacher_name": ckpt_path,
            "download_root": str(tmp_path / "cache"),
        },
        train_batch_size=8,
        val_batch_size=8,
        num_workers=0,
    )
    task = DistillTask(
        student=RepeatVisionTransformer(
            img_size=RES, patch_size=PATCH, out_dim=OUT, embed_dim=32,
            depth=2, num_heads=4, repeated_times=2, qkv_bias=True,
        ),
        loss_control_para={"loss_name": ["out_l1", "out_cos"]},
        teacher_name=ckpt_path, model_type="image",
        lr=1e-3, warm_steps=1, total_steps=4,
    )
    trainer = Trainer(max_epochs=1, result_dir=str(tmp_path), run_name="imgab",
                      log_every_n_steps=1, limit_val_batches=1)
    trainer.fit(task, dm)
    lines = [_json.loads(l) for l in open(tmp_path / "imgab" / "metrics.jsonl")]
    assert any("train_loss/loss" in d for d in lines)

    # train items carry the cached teacher rep at the teacher's out dim
    item = dm.trainset[0]
    assert item["tea_rep"].shape == (OUT,)
    # rep order matches the (sorted) path order the cache was built with
    assert dm.trainset.path_list == sorted(dm.trainset.path_list)

    # RandAugment + cached reps must refuse to combine
    from distillclip_tpu.data.component.combine_image_dataset import (
        CombineImageDataset,
    )

    with pytest.raises(ValueError, match="augment_train"):
        CombineImageDataset(
            combine_dataset_path=f"{corpus}/combined", train=True,
            image_use=["coco", "imagenet"], image_size=RES,
            cached_teacher_reps=True, augment_train=True,
            cache_dir=str(tmp_path / "cache"), teacher_name=ckpt_path,
        )
