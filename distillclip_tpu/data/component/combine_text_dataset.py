"""Stage-2 text-distillation data (Conceptual Captions tsv + COCO captions).

Reference: data/component/combine_text_dataset.py.
* ``prepare``: tokenizes CC3M tsv + COCO train captions into one token
  array cache, and builds a val cache of COCO-val captions + tokens +
  TEACHER image embeddings of val2017 (combine_text_dataset.py:35-82).
* train items: one token vector; val items: (tokens, teacher image rep).

Batch dicts: train {'inputs': tokens}, val {'inputs': tokens,
'contrary': image_rep}.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from distillclip_tpu.data.component.ms_coco import load_coco_index
from distillclip_tpu.data.component.utils import encode_images
from distillclip_tpu.data.loader import MapDataset
from distillclip_tpu.data.tokenizer import build_tokenizer

log = logging.getLogger(__name__)


def _train_cache(cache_dir, teacher_name):
    return Path(cache_dir) / f'text-cache-train-{teacher_name.replace("/", "-")}.npz'


def _val_cache(cache_dir, teacher_name):
    return Path(cache_dir) / f'text-cache-val-{teacher_name.replace("/", "-")}.npz'


def _train_rep_cache(cache_dir, teacher_name):
    return Path(cache_dir) / f'text-cache-train-reps-{teacher_name.replace("/", "-")}.npz'


def prepare(prepare_args: dict) -> None:
    cache_dir = Path(prepare_args["cache_dir"])
    raw_data_dir = Path(prepare_args["raw_data_dir"])
    teacher_name = prepare_args["teacher_name"]
    overwrite = prepare_args.get("overwrite", False)
    text_use = prepare_args.get("text_use", ["cc"])
    context_length = prepare_args.get("context_length", 77)
    cache_dir.mkdir(parents=True, exist_ok=True)

    tokenizer = build_tokenizer(prepare_args.get("bpe_path"), context_length=context_length)

    train_cache = _train_cache(cache_dir, teacher_name)
    if overwrite or not train_cache.exists():
        log.info("building train token cache...")
        raw_text = []
        cc_file = raw_data_dir / "cc" / "train_cc3m.tsv"
        coco_file = raw_data_dir / "mscoco" / "annotations" / "captions_train2017.json"
        if "cc" in text_use:
            with cc_file.open("r", encoding="utf8") as f:
                for line in f:
                    raw_text.append(line.split("\t")[0])
        if "coco" in text_use:
            with coco_file.open("r", encoding="utf8") as f:
                for ann in json.load(f)["annotations"]:
                    raw_text.append(ann["caption"])
        log.info("All data: %d. Begin tokenizing...", len(raw_text))
        tokens = tokenizer.tokenize(raw_text, context_length=context_length)
        np.savez(train_cache, tokens=tokens)

    # optional: pre-encode the TRAIN corpus with the frozen teacher so the
    # train step can drop the teacher tower (cached_teacher fast path);
    # only valid for no-tap loss configs — see DistillTask.make_train_step
    if prepare_args.get("cache_train_reps"):
        rep_cache = _train_rep_cache(cache_dir, teacher_name)
        if overwrite or not rep_cache.exists():
            from distillclip_tpu.data.component.utils import encode_tokens

            log.info("pre-encoding train tokens with the teacher text tower...")
            tokens = np.load(train_cache)["tokens"]
            reps = encode_tokens(
                tokens, teacher_name, download_root=prepare_args.get("download_root")
            )
            np.savez(rep_cache, train_rep=reps)

    val_cache = _val_cache(cache_dir, teacher_name)
    if overwrite or not val_cache.exists():
        log.info("building val cache (teacher image embeddings)...")
        val_dir = raw_data_dir / "mscoco" / "val2017"
        ann = raw_data_dir / "mscoco" / "annotations" / "captions_val2017.json"
        index = load_coco_index(str(ann))
        captions = [caps[0] for name, caps in index]
        paths = [str(val_dir / name) for name, _ in index]
        tokens = tokenizer.tokenize(captions, context_length=context_length)
        image_rep = encode_images(
            paths, teacher_name, download_root=prepare_args.get("download_root")
        )
        np.savez(
            val_cache,
            captions=np.asarray(captions),
            tokens=tokens,
            paths=np.asarray(paths),
            image_rep=image_rep,
        )
    log.info("Cache generation done!")


class CombineTextDataset(MapDataset):
    def __init__(self, cache_dir: str = "./.cache", train: bool = True,
                 teacher_name: str = "ViT-B/32", cached_teacher_reps: bool = False):
        self.train = train
        self.train_rep = None
        if train:
            data = np.load(_train_cache(cache_dir, teacher_name))
            self.tokens = data["tokens"]
            if cached_teacher_reps:
                rep_cache = _train_rep_cache(cache_dir, teacher_name)
                if not rep_cache.exists():
                    raise FileNotFoundError(
                        f"{rep_cache} not found: run prepare with "
                        "cache_train_reps=true to pre-encode the train corpus"
                    )
                self.train_rep = np.load(rep_cache)["train_rep"]
                if len(self.train_rep) != len(self.tokens):
                    raise ValueError(
                        f"teacher-rep cache rows ({len(self.train_rep)}) != "
                        f"train tokens ({len(self.tokens)}); re-run prepare "
                        "with overwrite=true"
                    )
        else:
            data = np.load(_val_cache(cache_dir, teacher_name), allow_pickle=False)
            self.tokens = data["tokens"]
            self.image_rep = data["image_rep"]

    def __len__(self):
        return len(self.tokens)

    def __getitem__(self, idx):
        if self.train:
            if self.train_rep is not None:
                return {"inputs": self.tokens[idx], "tea_rep": self.train_rep[idx]}
            return {"inputs": self.tokens[idx]}
        return {"inputs": self.tokens[idx], "contrary": self.image_rep[idx]}
