"""MSCOCO captions dataset (stage 3 data).

Reference: data/component/ms_coco.py — torchvision CocoCaptions with
train2017/val2017 split, first caption per image, RandAugment for train.
This version reads the COCO annotation JSON directly (no torchvision).

Batch dict: {'images': [B,224,224,3] f32 NHWC, 'tokens': [B,77] i32}.
"""

from __future__ import annotations

import json
import os
import random
from typing import Optional

import numpy as np
from PIL import Image

from distillclip_tpu.data.loader import MapDataset
from distillclip_tpu.data.tokenizer import build_tokenizer
from distillclip_tpu.data.transforms import eval_image_transform, train_image_transform


def load_coco_index(annotation_file: str):
    """[(file_name, [captions...])] sorted by image id (CocoCaptions order)."""
    with open(annotation_file) as f:
        data = json.load(f)
    id2file = {img["id"]: img["file_name"] for img in data["images"]}
    id2captions = {}
    for ann in data["annotations"]:
        id2captions.setdefault(ann["image_id"], []).append(ann["caption"])
    index = []
    for img_id in sorted(id2file):
        caps = id2captions.get(img_id)
        if caps:
            index.append((id2file[img_id], caps))
    return index


def _caption_rep_cache(cache_dir, teacher_name):
    from pathlib import Path

    return Path(cache_dir) / (
        f'coco-caption-reps-train2017-{teacher_name.replace("/", "-")}.npz'
    )


def _image_rep_cache(cache_dir, teacher_name):
    from pathlib import Path

    return Path(cache_dir) / (
        f'coco-image-reps-train2017-{teacher_name.replace("/", "-")}.npz'
    )


def prepare(prepare_args: dict) -> None:
    """Optional: pre-encode the train2017 FIRST captions with the frozen
    teacher text tower (``cache_caption_reps: true``).  Stage-3 captions
    are fixed token tensors, so the teacher text tower's outputs are
    per-sample constants; with the cache the joint train step drops that
    tower entirely (DualDistillTask cached_text_teacher — valid for no-tap
    loss configs such as the shipped l_clip.yaml)."""
    if not (prepare_args.get("cache_caption_reps")
            or prepare_args.get("cache_image_reps")):
        return
    cache_dir = prepare_args.get("cache_dir", "./.cache")
    teacher_name = prepare_args["teacher_name"]
    os.makedirs(cache_dir, exist_ok=True)
    ann = os.path.join(prepare_args["annotation_path"], "captions_train2017.json")
    index = load_coco_index(ann)

    if prepare_args.get("cache_caption_reps"):
        from distillclip_tpu.data.component.utils import encode_texts

        cache = _caption_rep_cache(cache_dir, teacher_name)
        if not cache.exists() or prepare_args.get("overwrite", False):
            captions = [caps[0] for _, caps in index]
            reps = encode_texts(
                captions, teacher_name,
                download_root=prepare_args.get("download_root"),
                bpe_path=prepare_args.get("bpe_path"),
            )
            np.savez(cache, caption_rep=reps)

    if prepare_args.get("cache_image_reps"):
        # fully-cached teacher (FLOP lever): pre-encode the train images
        # with the EVAL transform — only valid together with
        # augment_train: false, which the dataset enforces
        from distillclip_tpu.data.component.utils import encode_images

        cache = _image_rep_cache(cache_dir, teacher_name)
        if not cache.exists() or prepare_args.get("overwrite", False):
            root = os.path.join(prepare_args["root_path"], "train2017")
            paths = [os.path.join(root, fn) for fn, _ in index]
            reps = encode_images(
                paths, teacher_name,
                download_root=prepare_args.get("download_root"),
            )
            np.savez(cache, image_rep=reps)


class COCODataset(MapDataset):
    def __init__(
        self,
        root_path: str,
        annotation_path: str,
        need_type: str = "all",
        train: bool = True,
        image_size: int = 224,
        context_length: int = 77,
        bpe_path: Optional[str] = None,
        rand_augment_ops: int = 4,
        cached_text_teacher_reps: bool = False,
        cached_image_teacher_reps: bool = False,
        augment_train: bool = True,
        cache_dir: str = "./.cache",
        teacher_name: str = "ViT-B/32",
    ):
        if need_type not in ("all", "text", "image"):
            raise ValueError(
                "the mscoco dataset need_type parameter should is ['all', 'text', "
                f"'image'], bug get {need_type}"
            )
        self.need_type = need_type
        self.train = train
        split = "train2017" if train else "val2017"
        self.root = os.path.join(root_path, split)
        ann = os.path.join(annotation_path, f"captions_{split}.json")
        self.index = load_coco_index(ann)
        self.tokenizer = build_tokenizer(bpe_path, context_length=context_length)
        self.context_length = context_length
        self.transform = (
            train_image_transform(image_size, rand_augment_ops)
            if train and augment_train
            else eval_image_transform(image_size)
        )
        self.caption_rep = None
        self.image_rep = None
        if cached_image_teacher_reps and train:
            # fully-cached teacher (documented deviation, BASELINE.md
            # north-star analysis): valid only with fixed train pixels
            if augment_train:
                raise ValueError(
                    "cached_image_teacher_reps requires augment_train: false "
                    "— RandAugmented pixels change every epoch, so the "
                    "teacher image reps are not per-sample constants "
                    "(reference keeps the image teacher live for exactly "
                    "this reason, ms_coco.py:15-21)"
                )
            cache = _image_rep_cache(cache_dir, teacher_name)
            if not cache.exists():
                raise FileNotFoundError(
                    f"{cache} not found: run prepare with cache_image_reps="
                    "true to pre-encode the train images"
                )
            self.image_rep = np.load(cache)["image_rep"]
            if len(self.image_rep) != len(self.index):
                raise ValueError(
                    f"image-rep cache rows ({len(self.image_rep)}) != "
                    f"dataset size ({len(self.index)}); re-run prepare with "
                    "overwrite=true"
                )
        if cached_text_teacher_reps and train:
            cache = _caption_rep_cache(cache_dir, teacher_name)
            if not cache.exists():
                raise FileNotFoundError(
                    f"{cache} not found: run prepare with cache_caption_reps="
                    "true to pre-encode the train captions"
                )
            self.caption_rep = np.load(cache)["caption_rep"]
            if len(self.caption_rep) != len(self.index):
                raise ValueError(
                    f"caption-rep cache rows ({len(self.caption_rep)}) != "
                    f"dataset size ({len(self.index)}); re-run prepare with "
                    "overwrite=true"
                )

    def __len__(self):
        return len(self.index)

    def __getitem__(self, idx):
        file_name, captions = self.index[idx]
        tokens = self.tokenizer.tokenize(
            captions[0], context_length=self.context_length
        )[0]
        if self.need_type == "text" and self.train:
            return {"tokens": tokens}
        img = Image.open(os.path.join(self.root, file_name))
        image = self.transform(img)
        if self.need_type == "image" and self.train:
            return {"images": image}
        item = {"images": image, "tokens": tokens}
        if self.caption_rep is not None:
            item["tea_rep"] = self.caption_rep[idx]
        if self.image_rep is not None:
            item["tea_img_rep"] = self.image_rep[idx]
        return item
