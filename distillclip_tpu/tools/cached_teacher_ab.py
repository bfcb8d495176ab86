"""Quality A/B: augmented + live teacher vs no-augment + cached teacher
reps (the FLOP lever, BASELINE.md "North-star feasibility").

The reference RandAugments train images (stage 3: reference
data/component/ms_coco.py:15-21; stage 1: combine_image_dataset.py:85-117),
which forces a live teacher image tower every step.  The deviation
configs (configs/final/l_clip_allcached.yaml / image_allcached.yaml)
drop augmentation so frozen-teacher reps can be pre-encoded and the
teacher leaves the step.  This tool runs both configurations on the
fabricated corpus (zero-egress stand-in) at tiny scale and reports
end-of-run validation metrics side by side:

    python -m distillclip_tpu.tools.cached_teacher_ab --epochs 8
    python -m distillclip_tpu.tools.cached_teacher_ab --stage image

The corpus is synthetic, so the absolute numbers mean nothing; the A/B
isolates what augmentation + the live teacher contribute under otherwise
identical seeds/schedules.  Results are recorded in BENCH_NOTES.md.
"""

from __future__ import annotations

import argparse
import json
import os


def run_ab(workdir: str, epochs: int = 8, n_train: int = 256, n_val: int = 64,
           seed: int = 2022):
    import torch

    from distillclip_tpu.data.datamodule import MainDataModule
    from distillclip_tpu.models import RepeatTextTransformer, RepeatVisionTransformer
    from distillclip_tpu.tools.fabricate_images import (
        fabricate,
        fabricate_coco_train,
    )
    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict
    from distillclip_tpu.training import DualDistillTask
    from distillclip_tpu.training.trainer import Trainer

    size = 32
    corpus = os.path.join(workdir, "corpus")
    teacher = os.path.join(workdir, "tiny_clip.pt")
    if not os.path.exists(os.path.join(
            corpus, "mscoco", "annotations", "captions_train2017.json")):
        fabricate(corpus, n_train=0, n_val=n_val, size=size)
        fabricate_coco_train(corpus, n_train=n_train, size=size)
    if not os.path.exists(teacher):
        torch.save(make_clip_state_dict(), teacher)

    def build_dm(augment: bool, cache_dir: str):
        prepare = {"cache_caption_reps": True}
        para = {
            "root_path": f"{corpus}/mscoco",
            "annotation_path": f"{corpus}/mscoco/annotations",
            "image_size": size,
            "cached_text_teacher_reps": True,
            "augment_train": augment,
            "cache_dir": cache_dir,
            "teacher_name": teacher,
            "download_root": cache_dir,
        }
        if not augment:
            prepare["cache_image_reps"] = True
            para["cached_image_teacher_reps"] = True
        return MainDataModule(
            dataset="ms_coco", dataset_name="COCODataset",
            prepare_para=prepare, dataset_para=para,
            train_batch_size=32, val_batch_size=32, num_workers=0,
        )

    def build_task():
        return DualDistillTask(
            image_student=RepeatVisionTransformer(
                img_size=size, patch_size=8, out_dim=48, embed_dim=64,
                depth=2, num_heads=4, repeated_times=2, qkv_bias=True,
                use_transform=True,
            ),
            text_student=RepeatTextTransformer(
                vocab_size=49408, context_length=77, out_dim=48, embed_dim=64,
                depth=2, num_heads=4, repeated_times=2, use_transform=True,
            ),
            loss_control_para={"loss_name": ["out_l1", "out_cos", "cos_diff"],
                               "loss_scale": {"cos_diff": 0.1}},
            teacher_name=teacher, download_root=workdir,
            lr=1e-3, warm_steps=2, total_steps=max(epochs, 4),
        )

    results = {}
    for name, augment in (("augmented_live", True), ("noaugment_cached", False)):
        dm = build_dm(augment, os.path.join(workdir, f"cache_{name}"))
        trainer = Trainer(
            max_epochs=epochs, result_dir=os.path.join(workdir, "result"),
            run_name=name, log_every_n_steps=4, seed=seed,
        )
        trainer.fit(build_task(), dm)
        metrics_path = os.path.join(workdir, "result", name, "metrics.jsonl")
        last_val = {}
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if any(k.startswith("val_") for k in rec):
                    last_val = rec
        results[name] = {
            k: v for k, v in last_val.items()
            if k.startswith(("val_loss/", "val_stu_acc/", "val_step/"))
        }
    return results


def run_ab_image(workdir: str, epochs: int = 8, n_train: int = 256,
                 n_val: int = 64, seed: int = 2022):
    """Stage-1 variant: augmented + live image teacher vs no-augment +
    cached train-image reps (configs/final/image_allcached.yaml)."""
    import torch

    from distillclip_tpu.data.datamodule import MainDataModule
    from distillclip_tpu.models import RepeatVisionTransformer
    from distillclip_tpu.tools.fabricate_images import fabricate
    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict
    from distillclip_tpu.training import DistillTask
    from distillclip_tpu.training.trainer import Trainer

    size = 32
    corpus = os.path.join(workdir, "corpus_image")
    teacher = os.path.join(workdir, "tiny_clip.pt")
    if not os.path.exists(os.path.join(
            corpus, "mscoco", "annotations", "captions_val2017.json")):
        fabricate(corpus, n_train=n_train, n_val=n_val, size=size)
    if not os.path.exists(teacher):
        torch.save(make_clip_state_dict(), teacher)

    def build_dm(augment: bool, cache_dir: str):
        prepare = {
            "raw_data_dir": corpus,
            "overwrite": False,
        }
        para = {
            "combine_dataset_path": os.path.join(corpus, "combined"),
            "image_use": ["coco", "imagenet"],
            "image_size": size,
            "augment_train": augment,
            "cache_dir": cache_dir,
            "teacher_name": teacher,
            "download_root": cache_dir,
        }
        if not augment:
            prepare["cache_train_image_reps"] = True
            para["cached_teacher_reps"] = True
        return MainDataModule(
            dataset="combine_image_dataset", dataset_name="CombineImageDataset",
            prepare_para=prepare, dataset_para=para,
            train_batch_size=32, val_batch_size=32, num_workers=0,
        )

    def build_task():
        return DistillTask(
            student=RepeatVisionTransformer(
                img_size=size, patch_size=8, out_dim=48, embed_dim=64,
                depth=2, num_heads=4, repeated_times=2, qkv_bias=True,
                use_transform=True,
            ),
            loss_control_para={"loss_name": ["out_l1", "out_cos"]},
            teacher_name=teacher, download_root=workdir, model_type="image",
            lr=1e-3, warm_steps=2, total_steps=max(epochs, 4),
        )

    results = {}
    for name, augment in (("augmented_live", True), ("noaugment_cached", False)):
        dm = build_dm(augment, os.path.join(workdir, f"cache_img_{name}"))
        trainer = Trainer(
            max_epochs=epochs, result_dir=os.path.join(workdir, "result"),
            run_name=f"image_{name}", log_every_n_steps=4, seed=seed,
        )
        trainer.fit(build_task(), dm)
        metrics_path = os.path.join(
            workdir, "result", f"image_{name}", "metrics.jsonl")
        last_val = {}
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                if any(k.startswith("val_") for k in rec):
                    last_val = rec
        results[name] = {
            k: v for k, v in last_val.items()
            if k.startswith(("val_loss/", "val_stu_acc/", "val_step/",
                             "val_stu_score/"))
        }
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="./.cache/cached_teacher_ab")
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=64)
    ap.add_argument("--stage", choices=["l_clip", "image"], default="l_clip")
    args = ap.parse_args(argv)
    os.makedirs(args.workdir, exist_ok=True)
    fn = run_ab if args.stage == "l_clip" else run_ab_image
    results = fn(args.workdir, args.epochs, args.n_train, args.n_val)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
