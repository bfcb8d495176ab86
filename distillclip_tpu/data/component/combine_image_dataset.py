"""Stage-1 image-distillation data (MSCOCO + ImageNet flat folder).

Reference: data/component/combine_image_dataset.py.
* ``prepare``: caches COCO-val caption embeddings pre-encoded with the
  TEACHER (reference runs the clip package on CUDA,
  combine_image_dataset.py:17-55; here it is our JAX text tower on
  whatever accelerator is present).
* train items: augmented images from a combined flat folder filtered by
  filename prefix (coco='0', imagenet='imagenet', utils.py:6-10);
* val items: (image, cached teacher caption embedding).

Batch dicts: train {'inputs': img}, val {'inputs': img, 'contrary': rep}.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image

from distillclip_tpu.data.component.utils import IMAGE_DATASET_NAME, IMAGE_PREFIX, encode_texts
from distillclip_tpu.data.component.ms_coco import load_coco_index
from distillclip_tpu.data.loader import MapDataset
from distillclip_tpu.data.transforms import eval_image_transform, train_image_transform

log = logging.getLogger(__name__)


def _cache_path(cache_dir, teacher_name):
    return Path(cache_dir) / f'image-cache-val-{teacher_name.replace("/", "-")}.npz'


def _train_rep_cache(cache_dir, teacher_name):
    return Path(cache_dir) / (
        f'image-cache-train-reps-{teacher_name.replace("/", "-")}.npz'
    )


def _train_paths(combine_dataset_path, image_use) -> List[str]:
    """Deterministic (sorted) train path list for the combined flat folder.

    The rep cache is keyed by row index, so the path order must be stable
    across prepare and dataset construction — ``iterdir`` order is not.
    """
    prefixes = tuple(IMAGE_PREFIX[n] for n in image_use)
    root = Path(combine_dataset_path)
    return sorted(str(p) for p in root.iterdir() if p.name.startswith(prefixes))


def prepare(prepare_args: dict) -> None:
    """Pre-encode COCO val2017 captions with the teacher text tower
    (combine_image_dataset.py:17-55)."""
    raw_data_dir = Path(prepare_args["raw_data_dir"])
    cache_dir = Path(prepare_args["cache_dir"])
    teacher_name = prepare_args["teacher_name"]
    overwrite = prepare_args.get("overwrite", False)
    cache_dir.mkdir(parents=True, exist_ok=True)

    cache_path = _cache_path(cache_dir, teacher_name)
    if overwrite or not cache_path.exists():
        # NOT an early return: the optional train-rep cache below must
        # still build when the val cache already exists (a corpus prepared
        # once for the live config, later switched to image_allcached)
        log.info("the cache not exists or overwrite set; encoding val captions")
        val_dir = raw_data_dir / "mscoco" / "val2017"
        ann = raw_data_dir / "mscoco" / "annotations" / "captions_val2017.json"
        index = load_coco_index(str(ann))
        captions = [caps[0] for _, caps in index]
        paths = [str(val_dir / name) for name, _ in index]
        captions_rep = encode_texts(
            captions, teacher_name,
            download_root=prepare_args.get("download_root"),
            bpe_path=prepare_args.get("bpe_path"),
        )
        np.savez(
            cache_path,
            paths=np.asarray(paths),
            captions_rep=captions_rep,
            captions=np.asarray(captions),
        )
        log.info("cache data saved in %s", cache_path)

    # optional stage-1 FLOP lever (documented deviation, BASELINE.md
    # north-star analysis): pre-encode the TRAIN images with the frozen
    # teacher image tower so the train step can drop the teacher entirely
    # (DistillTask cached_teacher).  Only valid with augment_train: false —
    # the reference keeps its teacher live solely because train images are
    # RandAugmented (combine_image_dataset.py:85-117).
    if prepare_args.get("cache_train_image_reps"):
        from distillclip_tpu.data.component.utils import encode_images

        rep_cache = _train_rep_cache(cache_dir, teacher_name)
        if overwrite or not rep_cache.exists():
            image_use = prepare_args.get("image_use") or ["coco", "imagenet"]
            paths_train = _train_paths(
                prepare_args["combine_dataset_path"], image_use
            )
            log.info(
                "pre-encoding %d train images with the teacher image tower...",
                len(paths_train),
            )
            reps = encode_images(
                paths_train, teacher_name,
                download_root=prepare_args.get("download_root"),
            )
            np.savez(rep_cache, paths=np.asarray(paths_train), train_rep=reps)


class CombineImageDataset(MapDataset):
    def __init__(
        self,
        combine_dataset_path: str,
        train: bool = True,
        image_use: Optional[List[str]] = None,
        cache_dir: str = "./.cache",
        teacher_name: str = "ViT-B/32",
        image_size: int = 224,
        rand_augment_ops: int = 4,
        use_native_decode: bool = True,
        device_normalize: bool = False,
        augment_train: bool = True,
        cached_teacher_reps: bool = False,
    ):
        # device_normalize: emit raw uint8 pixels; the train step applies
        # (x/255 - mean)/std on device (train_state.prepare_inputs) — 4x
        # less host->device transfer than normalized fp32
        self.device_normalize = device_normalize
        if image_use is None:
            image_use = ["coco", "imagenet"]
        for i in image_use:
            assert i in IMAGE_DATASET_NAME, (
                f"the {i} dataset name is not exists in {IMAGE_DATASET_NAME}"
            )
        self.train = train
        self.augment_train = augment_train
        self.train_rep = None
        if train:
            if cached_teacher_reps:
                # stage-1 FLOP lever: fixed train pixels + pre-encoded
                # teacher reps; the rep cache's (sorted) path order is
                # authoritative so rep[i] matches path_list[i]
                if augment_train:
                    raise ValueError(
                        "cached_teacher_reps requires augment_train: false "
                        "— RandAugmented pixels change every epoch, so the "
                        "teacher image reps are not per-sample constants "
                        "(reference keeps the image teacher live for exactly "
                        "this reason, combine_image_dataset.py:85-117)"
                    )
                rep_cache = _train_rep_cache(cache_dir, teacher_name)
                if not rep_cache.exists():
                    raise FileNotFoundError(
                        f"{rep_cache} not found: run prepare with "
                        "cache_train_image_reps=true to pre-encode the train "
                        "images"
                    )
                data = np.load(rep_cache, allow_pickle=False)
                self.path_list = [str(p) for p in data["paths"]]
                self.train_rep = data["train_rep"]
                # the cache is keyed by teacher only; refuse silently
                # serving a corpus the requested image_use excludes
                prefixes = tuple(IMAGE_PREFIX[n] for n in image_use)
                bad = [
                    p for p in self.path_list
                    if not os.path.basename(p).startswith(prefixes)
                ]
                if bad:
                    raise ValueError(
                        f"teacher-rep cache {rep_cache} was built from a "
                        f"different image_use than {image_use} (e.g. "
                        f"{os.path.basename(bad[0])!r}); re-run prepare "
                        "with overwrite=true"
                    )
            else:
                self.path_list = _train_paths(combine_dataset_path, image_use)
            # NOTE (quirk preserved): reference train transform skips
            # resize/crop — the combined folder is pre-sized 224x224
            # (combine_image_dataset.py:97-103)
            self.transform = (
                train_image_transform(image_size, rand_augment_ops)
                if augment_train
                else eval_image_transform(image_size)
            )
            self.captions_rep = None
            self.image_size = image_size
            # native libjpeg decode (resize/crop in C++) feeding RandAugment;
            # per-item and GIL-free, so loader threads decode in parallel
            self.use_native_decode = use_native_decode
            from distillclip_tpu.data import native_loader
            from distillclip_tpu.data.transforms import RandAugment

            self._native = native_loader
            self._rand_augment = (
                RandAugment(num_ops=rand_augment_ops) if augment_train else None
            )
        else:
            data = np.load(_cache_path(cache_dir, teacher_name), allow_pickle=False)
            self.path_list = [str(p) for p in data["paths"]]
            self.captions_rep = data["captions_rep"]
            self.captions = data["captions"]
            self.transform = eval_image_transform(image_size)

    def __len__(self):
        return len(self.path_list)

    def _train_item(self, arr_or_img, idx):
        """Assemble a train batch dict (+ cached teacher rep if present)."""
        item = {"inputs": arr_or_img}
        if self.train_rep is not None:
            item["tea_rep"] = self.train_rep[idx]
        return item

    def __getitem__(self, idx):
        from distillclip_tpu.data.transforms import to_normalized_array

        path = self.path_list[idx]
        if self.train and self.use_native_decode:
            raw = self._native.decode_raw_file(path, self.image_size)
            if raw is not None:
                augmented = (
                    self._rand_augment(Image.fromarray(raw))
                    if self._rand_augment is not None
                    else Image.fromarray(raw)
                )
                if self.device_normalize:
                    return self._train_item(
                        np.asarray(augmented.convert("RGB"), np.uint8), idx
                    )
                return self._train_item(to_normalized_array(augmented), idx)
            # fall through to PIL on non-JPEG / decode failure.  Warn ONCE:
            # the native path resizes bilinear/area while PIL uses bicubic,
            # so a missing libdcloader.so would otherwise silently change
            # the train-time pixel statistics (advisor r2 finding).
            if not getattr(CombineImageDataset, "_warned_pil_fallback", False):
                CombineImageDataset._warned_pil_fallback = True
                log.warning(
                    "native decode unavailable/failed for %s; falling back to "
                    "PIL (bicubic resample — pixel statistics differ slightly "
                    "from the native bilinear/area path)", path,
                )
        img = Image.open(path).convert("RGB")
        if self.train and self.device_normalize:
            from distillclip_tpu.data.transforms import center_crop, resize_shorter

            sized = center_crop(resize_shorter(img, self.image_size), self.image_size)
            augmented = (
                self._rand_augment(sized) if self._rand_augment is not None else sized
            )
            return self._train_item(np.asarray(augmented.convert("RGB"), np.uint8), idx)
        image = self.transform(img)
        if self.train:
            return self._train_item(image, idx)
        return {"inputs": image, "contrary": self.captions_rep[idx]}
