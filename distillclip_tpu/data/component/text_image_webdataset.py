"""WebDataset-format (.tar shard) image-text pipeline.

Reference: data/text_image_datamodule.py — webdataset shards of jpg+txt
pairs, 90/10 shard-level train/val split, decode -> resize/crop 224 ->
RandAugment(4) -> normalize, tokenized captions, equalized batch counts.

This implementation reads the tar shards directly (the webdataset package
is not a dependency): members are grouped by key (basename without
extension), decoded with PIL, and streamed through a shuffle buffer.
Batches are dropped-remainder ("ensure same number of batches in all
clients", text_image_datamodule.py:80).
"""

from __future__ import annotations

import io
import random
import tarfile
from pathlib import Path
from typing import Iterator, List, Optional, Tuple

import numpy as np
from PIL import Image

from distillclip_tpu.data.tokenizer import build_tokenizer
from distillclip_tpu.data.transforms import eval_image_transform, train_image_transform


def iter_tar_samples(tar_path: str) -> Iterator[Tuple[bytes, bytes]]:
    """Yield (jpg_bytes, txt_bytes) pairs grouped by sample key."""
    with tarfile.open(tar_path, "r|*") as tf:
        current_key = None
        parts = {}
        for member in tf:
            if not member.isfile():
                continue
            name = Path(member.name)
            key, ext = name.stem, name.suffix.lower().lstrip(".")
            if key != current_key:
                if current_key is not None and "jpg" in parts and "txt" in parts:
                    yield parts["jpg"], parts["txt"]
                current_key, parts = key, {}
            data = tf.extractfile(member).read()
            if ext in ("jpg", "jpeg", "png"):
                parts["jpg"] = data
            elif ext in ("txt", "text", "caption"):
                parts["txt"] = data
        if current_key is not None and "jpg" in parts and "txt" in parts:
            yield parts["jpg"], parts["txt"]


class TextImageDataModule:
    """Tar-shard datamodule with the reference's split/shuffle semantics."""

    def __init__(
        self,
        image_path: str,
        batch_size: int = 64,
        workers: int = 4,
        image_size: int = 224,
        context_length: int = 77,
        bpe_path: Optional[str] = None,
        val_fraction: float = 0.1,
        shuffle_buffer: int = 5000,
        seed: int = 2022,
        dataset_size: Optional[int] = None,
    ):
        # the reference hardcodes its webdataset sizes and paces DDP with
        # dataset_size // batch (text_image_datamodule.py:51-56,80); here
        # the size is a config knob that fixes the LR-schedule length
        self.dataset_size = dataset_size
        self.batch_size = batch_size
        self.image_size = image_size
        self.context_length = context_length
        self.shuffle_buffer = shuffle_buffer
        self.seed = seed
        urls = sorted(str(p) for p in Path(image_path).glob("*.tar"))
        if not urls:
            raise ValueError(f"no .tar shards under {image_path}")
        rng = random.Random(seed)
        rng.shuffle(urls)
        n_val = max(1, int(len(urls) * val_fraction))
        self.val_url = urls[:n_val]
        self.train_url = urls[n_val:]
        self.tokenizer = build_tokenizer(bpe_path, context_length=context_length)
        print(f"len(train) == {len(self.train_url)}, len(val) == {len(self.val_url)}")

    def prepare_data(self):
        pass

    def setup(self, stage=None):
        pass

    def steps_per_epoch(self) -> Optional[int]:
        """Schedule length for the trainer (drop-remainder batching)."""
        if self.dataset_size is None:
            return None
        return max(1, self.dataset_size // self.batch_size)

    def _iter_batches(self, urls: List[str], is_train: bool, epoch: int = 0):
        transform = (
            train_image_transform(self.image_size, rand_augment_ops=4)
            if is_train
            else eval_image_transform(self.image_size)
        )
        rng = random.Random(self.seed + epoch)
        urls = list(urls)
        if is_train:
            rng.shuffle(urls)

        def samples():
            buf = []
            for url in urls:
                for jpg, txt in iter_tar_samples(url):
                    if is_train and self.shuffle_buffer > 1:
                        buf.append((jpg, txt))
                        if len(buf) >= self.shuffle_buffer:
                            yield buf.pop(rng.randrange(len(buf)))
                    else:
                        yield jpg, txt
            while buf:
                yield buf.pop(rng.randrange(len(buf)))

        images, texts = [], []
        for jpg, txt in samples():
            img = Image.open(io.BytesIO(jpg))
            images.append(transform(img))
            texts.append(txt.decode("utf-8", errors="replace").strip())
            if len(images) == self.batch_size:
                tokens = self.tokenizer.tokenize(texts, context_length=self.context_length)
                yield {"images": np.stack(images), "tokens": tokens}
                images, texts = [], []
        # partial batch dropped (batched(partial=False), :67)

    def train_dataloader(self, epoch: int = 0):
        return self._iter_batches(self.train_url, is_train=True, epoch=epoch)

    def val_dataloader(self, epoch: int = 0):
        return self._iter_batches(self.val_url, is_train=False)
