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


def prepare(prepare_args: dict) -> None:
    """Pre-encode COCO val2017 captions with the teacher text tower
    (combine_image_dataset.py:17-55)."""
    raw_data_dir = Path(prepare_args["raw_data_dir"])
    cache_dir = Path(prepare_args["cache_dir"])
    teacher_name = prepare_args["teacher_name"]
    overwrite = prepare_args.get("overwrite", False)
    cache_dir.mkdir(parents=True, exist_ok=True)

    cache_path = _cache_path(cache_dir, teacher_name)
    if cache_path.exists() and not overwrite:
        return
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
        if train:
            prefixes = tuple(IMAGE_PREFIX[n] for n in image_use)
            root = Path(combine_dataset_path)
            self.path_list = [
                str(p) for p in root.iterdir() if p.name.startswith(prefixes)
            ]
            # NOTE (quirk preserved): reference train transform skips
            # resize/crop — the combined folder is pre-sized 224x224
            # (combine_image_dataset.py:97-103)
            self.transform = train_image_transform(image_size, rand_augment_ops)
            self.captions_rep = None
            self.image_size = image_size
            # native libjpeg decode (resize/crop in C++) feeding RandAugment;
            # per-item and GIL-free, so loader threads decode in parallel
            self.use_native_decode = use_native_decode
            from distillclip_tpu.data import native_loader
            from distillclip_tpu.data.transforms import RandAugment

            self._native = native_loader
            self._rand_augment = RandAugment(num_ops=rand_augment_ops)
        else:
            data = np.load(_cache_path(cache_dir, teacher_name), allow_pickle=False)
            self.path_list = [str(p) for p in data["paths"]]
            self.captions_rep = data["captions_rep"]
            self.captions = data["captions"]
            self.transform = eval_image_transform(image_size)

    def __len__(self):
        return len(self.path_list)

    def __getitem__(self, idx):
        from distillclip_tpu.data.transforms import to_normalized_array

        path = self.path_list[idx]
        if self.train and self.use_native_decode:
            raw = self._native.decode_raw_file(path, self.image_size)
            if raw is not None:
                augmented = self._rand_augment(Image.fromarray(raw))
                if self.device_normalize:
                    return {"inputs": np.asarray(augmented.convert("RGB"), np.uint8)}
                return {"inputs": to_normalized_array(augmented)}
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

            augmented = self._rand_augment(
                center_crop(resize_shorter(img, self.image_size), self.image_size)
            )
            return {"inputs": np.asarray(augmented.convert("RGB"), np.uint8)}
        image = self.transform(img)
        if self.train:
            return {"inputs": image}
        return {"inputs": image, "contrary": self.captions_rep[idx]}
