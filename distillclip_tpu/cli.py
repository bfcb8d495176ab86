"""Command-line interface.

TPU-native equivalent of reference main.py (MyLightningCLI):

    distillclip fit -c share.yaml -c version.yaml [--seed 2022] [--ckpt PATH]
    distillclip validate -c config.yaml --ckpt PATH
    distillclip score --image-ckpt A --text-ckpt B --images DIR --captions F
    python -m distillclip_tpu.cli fit -c config/smoke_text.yaml

Multi ``-c`` flags deep-merge (share + version, sh/run.py:23-30); the
resolved config is snapshotted next to the run results
(save_config_overwrite, main.py:24); everything is seeded (default 2022,
main.py:24).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import List, Optional

import numpy as np


def _seed_everything(seed: int):
    import random

    random.seed(seed)
    np.random.seed(seed)


def _build(cfg, seed):
    from distillclip_tpu.config import build_trainer, instantiate

    task = instantiate(cfg.get("model"))
    datamodule = instantiate(cfg.get("data"))
    trainer = build_trainer(cfg.get("trainer"), seed=seed)
    return task, datamodule, trainer


def cmd_fit(args) -> int:
    from distillclip_tpu.config import (
        apply_perf_config,
        load_configs,
        save_resolved_config,
    )

    _seed_everything(args.seed)
    cfg = load_configs(args.config)
    # perf knobs: YAML -> DISTILLCLIP_* env (env overrides YAML); the
    # snapshot records the EFFECTIVE values so it fully determines the
    # compiled step (the ops read the environment at trace time)
    cfg["perf"] = apply_perf_config(cfg.get("perf"))
    task, datamodule, trainer = _build(cfg, args.seed)
    os.makedirs(f"{trainer.result_dir}/{trainer.run_name}", exist_ok=True)
    save_resolved_config(cfg, f"{trainer.result_dir}/{trainer.run_name}/config.yaml")
    result = trainer.fit(task, datamodule, ckpt_path=args.ckpt_path)
    print(json.dumps({"summary": result["summary"]}))
    return 0


def cmd_validate(args) -> int:
    from distillclip_tpu.config import apply_perf_config, load_configs
    from distillclip_tpu.training.checkpoints import restore_pytree

    _seed_everything(args.seed)
    cfg = load_configs(args.config)
    cfg["perf"] = apply_perf_config(cfg.get("perf"))
    task, datamodule, trainer = _build(cfg, args.seed)

    import jax
    import jax.numpy as jnp

    datamodule.prepare_data()
    datamodule.setup("fit")
    sample = next(iter(datamodule.train_dataloader()))
    rng = jax.random.PRNGKey(args.seed)
    if hasattr(task, "image_student"):
        state, _ = task.init_state(
            rng, jnp.asarray(sample["tokens"][:1]), jnp.asarray(sample["images"][:1]), 1
        )
    else:
        state, _ = task.init_state(rng, jnp.asarray(sample["inputs"][:1]), 1)
    if args.ckpt_path:
        restored = restore_pytree(args.ckpt_path, {"state": state, "epoch": 0})
        state = restored["state"]
    metrics = trainer.validate(task, datamodule, state)
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_lr_find(args) -> int:
    """LR range test (Lightning auto_lr_find, sh/gene_template.py:104)."""
    from distillclip_tpu.config import apply_perf_config, load_configs
    from distillclip_tpu.tools.lr_finder import lr_find

    _seed_everything(args.seed)
    cfg = load_configs(args.config)
    cfg["perf"] = apply_perf_config(cfg.get("perf"))
    task, datamodule, _trainer = _build(cfg, args.seed)
    result = lr_find(
        task, datamodule, min_lr=args.min_lr, max_lr=args.max_lr,
        num_steps=args.steps, seed=args.seed,
    )
    print(json.dumps({
        "suggested_lr": result["suggestion"],
        "diverged_at": result["diverged_at"],
        "steps_run": len(result["lrs"]),
    }))
    return 0 if result["suggestion"] is not None else 1


def cmd_score(args) -> int:
    """L-CLIPScore batch inference (the serving path)."""
    from distillclip_tpu.serving.lclip_score import LCLIPScorer

    scorer = LCLIPScorer.from_checkpoints(
        image_ckpt=args.image_ckpt,
        text_ckpt=args.text_ckpt,
        config=args.config[0] if args.config else None,
        bpe_path=args.bpe_path,
        teacher_name=args.teacher,
    )
    if args.images and args.captions:
        with open(args.captions) as f:
            captions = [line.rstrip("\n") for line in f if line.strip()]
        image_paths = sorted(
            os.path.join(args.images, p) for p in os.listdir(args.images)
        )[: len(captions)]
        scores = scorer.score_files(image_paths, captions)
        for p, c, s in zip(image_paths, captions, scores):
            print(json.dumps({"image": p, "caption": c, "l_clip_score": float(s)}))
        return 0
    print("score: need --images DIR and --captions FILE", file=sys.stderr)
    return 2


def main(argv: Optional[List[str]] = None) -> int:
    from distillclip_tpu.runtime import setup_cache

    setup_cache()
    parser = argparse.ArgumentParser(prog="distillclip")
    sub = parser.add_subparsers(dest="command", required=True)

    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "-c", "--config", action="append", default=[],
        help="YAML config (repeatable; later files override earlier)",
    )
    common.add_argument("--seed", type=int, default=2022)
    common.add_argument("--ckpt_path", "--ckpt", dest="ckpt_path", default=None)

    p_fit = sub.add_parser("fit", parents=[common], help="train a stage")
    p_fit.set_defaults(fn=cmd_fit)
    p_val = sub.add_parser("validate", parents=[common], help="run validation only")
    p_val.set_defaults(fn=cmd_validate)
    p_lr = sub.add_parser("lr_find", parents=[common],
                          help="LR range test (Lightning auto_lr_find)")
    p_lr.add_argument("--min-lr", type=float, default=1e-7)
    p_lr.add_argument("--max-lr", type=float, default=1.0)
    p_lr.add_argument("--steps", type=int, default=100)
    p_lr.set_defaults(fn=cmd_lr_find)
    p_score = sub.add_parser("score", parents=[common], help="L-CLIPScore inference")
    p_score.add_argument("--image-ckpt", required=False)
    p_score.add_argument("--text-ckpt", required=False)
    p_score.add_argument("--images", help="directory of images")
    p_score.add_argument("--captions", help="file with one caption per line")
    p_score.add_argument("--bpe-path", default=None)
    p_score.add_argument("--teacher", default="ViT-B/32",
                         help="teacher name or checkpoint path (used when no student ckpts)")
    p_score.set_defaults(fn=cmd_score)

    args = parser.parse_args(argv)
    if args.command in ("fit", "validate", "lr_find") and not args.config:
        parser.error(f"{args.command} requires at least one -c/--config")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
