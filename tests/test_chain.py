"""The full reference workflow as ONE chain, via the CLI.

Reference Readme.md:30-62: train stage-1 (image distill) and stage-2 (text
distill), then stage-3 (L-CLIP joint) warm-started from both stage
checkpoints, then score with the distilled towers.  Every piece is tested
elsewhere; this test proves the PLUMBING — trainer-format checkpoints
compose through ``load_path`` (dual_distill_model.py:22-38), and
``distillclip score`` serves from the joint run's checkpoint
(VERDICT r3 item 7).
"""

import json
import os

import numpy as np
import pytest
import torch
import yaml

from distillclip_tpu.cli import main as cli_main

from test_teacher import _make_state_dict, CTX, RES, VOCAB

TOWER_IMG = dict(img_size=RES, patch_size=8, out_dim=48, embed_dim=32,
                 depth=2, num_heads=2, repeated_times=2, qkv_bias=True,
                 use_transform=True)
TOWER_TXT = dict(vocab_size=VOCAB, context_length=CTX, out_dim=48,
                 embed_dim=32, depth=2, num_heads=2, repeated_times=2,
                 use_transform=True)


def _trainer_cfg(name, result_dir):
    return {
        "max_epochs": 2,
        "log_every_n_steps": 1,
        "check_val_every_n_epoch": 1,
        "limit_val_batches": 1,
        "logger": {"class_path": "tensorboard",
                   "init_args": {"dir": result_dir, "name": name}},
    }


def _losses_from_jsonl(path):
    losses = []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "train_loss/loss" in rec:
                losses.append(rec["train_loss/loss"])
    return losses


def test_three_stage_chain_and_score(tmp_path, capsys):
    teacher = str(tmp_path / "tiny_clip.pt")
    torch.save(_make_state_dict(), teacher)
    result_dir = str(tmp_path / "result")

    def fit(cfg, name):
        cfg_path = str(tmp_path / f"{name}.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        assert cli_main(["fit", "-c", cfg_path]) == 0
        last = f"{result_dir}/{name}/checkpoints/last"
        assert os.path.isdir(last), f"missing last checkpoint for {name}"
        return cfg_path, last

    # --- stage 1: image distill ---
    _, img_last = fit({
        "model": {"class_path": "DistillModel", "init_args": {
            "student_encoder": {
                "class_path": "model.component.weight_share_model.RepeatVisionTransformer",
                "init_args": dict(TOWER_IMG)},
            "loss_control_para": {"loss_name": ["out_l1", "out_cos"]},
            "teacher_name": teacher, "model_type": "image",
            "lr": 5e-3, "warm_steps": 1, "total_steps": 8,
        }},
        "data": {"class_path": "MainDataModule", "init_args": {
            "num_workers": 0, "dataset": "synthetic",
            "dataset_name": "SyntheticImageDataset",
            "train_batch_size": 8, "val_batch_size": 8,
            "dataset_para": {"size": 16, "image_size": RES, "embed_dim": 48},
        }},
        "trainer": _trainer_cfg("chain-image", result_dir),
    }, "chain-image")

    # --- stage 2: text distill ---
    _, txt_last = fit({
        "model": {"class_path": "DistillModel", "init_args": {
            "student_encoder": {
                "class_path": "model.component.weight_share_model.RepeatTextTransformer",
                "init_args": dict(TOWER_TXT)},
            "loss_control_para": {"loss_name": ["out_l1", "out_cos"]},
            "teacher_name": teacher, "model_type": "text",
            "lr": 5e-3, "warm_steps": 1, "total_steps": 8,
        }},
        "data": {"class_path": "MainDataModule", "init_args": {
            "num_workers": 0, "dataset": "synthetic",
            "dataset_name": "SyntheticTextDataset",
            "train_batch_size": 8, "val_batch_size": 8,
            "dataset_para": {"size": 16, "context_length": CTX,
                             "vocab_size": VOCAB, "embed_dim": 48},
        }},
        "trainer": _trainer_cfg("chain-text", result_dir),
    }, "chain-text")

    # --- stage 3: joint L-CLIP, warm-started from both stage checkpoints
    # (the composed restore raises inside DualDistillTask on any tower
    # structure mismatch, so a green fit proves the composition) ---
    dual_cfg, dual_last = fit({
        "model": {"class_path": "DualDistillModel", "init_args": {
            "image_student": {
                "class_path": "model.component.weight_share_model.RepeatVisionTransformer",
                "init_args": dict(TOWER_IMG)},
            "text_student": {
                "class_path": "model.component.weight_share_model.RepeatTextTransformer",
                "init_args": dict(TOWER_TXT)},
            "loss_control_para": {"loss_name": ["out_l1", "out_cos", "cos_diff"],
                                  "loss_scale": {"cos_diff": 0.1}},
            "teacher_name": teacher,
            "load_path": {"image": img_last, "text": txt_last},
            "lr": 1e-3, "warm_steps": 1, "total_steps": 8,
        }},
        "data": {"class_path": "MainDataModule", "init_args": {
            "num_workers": 0, "dataset": "synthetic",
            "dataset_name": "SyntheticPairDataset",
            "train_batch_size": 8, "val_batch_size": 8,
            "dataset_para": {"size": 16, "image_size": RES,
                             "context_length": CTX, "vocab_size": VOCAB},
        }},
        "trainer": _trainer_cfg("chain-dual", result_dir),
    }, "chain-dual")

    # joint loss decreased over the run
    losses = _losses_from_jsonl(f"{result_dir}/chain-dual/metrics.jsonl")
    assert len(losses) >= 2
    assert losses[-1] < losses[0], f"joint loss did not decrease: {losses}"

    # --- score from the JOINT checkpoint (tower= selection) ---
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(
            rng.integers(0, 255, size=(RES, RES, 3), dtype=np.uint8)
        ).save(img_dir / f"{i}.png")
    cap_file = tmp_path / "caps.txt"
    cap_file.write_text("a red square\na small dog\nblue sky\n")

    capsys.readouterr()  # drop fit output
    assert cli_main([
        "score", "--image-ckpt", dual_last, "--text-ckpt", dual_last,
        "-c", dual_cfg, "--images", str(img_dir), "--captions", str(cap_file),
    ]) == 0
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    scored = [json.loads(l) for l in out_lines if l.startswith("{")]
    assert len(scored) == 3
    assert all(np.isfinite(s["l_clip_score"]) for s in scored)
