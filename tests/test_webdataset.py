"""Tar-shard (webdataset-format) pipeline tests."""

import io
import tarfile

import numpy as np
import pytest
from PIL import Image

from distillclip_tpu.data.component.text_image_webdataset import (
    TextImageDataModule,
    iter_tar_samples,
)


def _make_shard(path, n, start=0):
    with tarfile.open(path, "w") as tf:
        for i in range(start, start + n):
            img = Image.fromarray(
                (np.full((40, 60, 3), (i * 17) % 255)).astype(np.uint8)
            )
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"sample{i:04d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"caption number {i}".encode()
            info = tarfile.TarInfo(f"sample{i:04d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))


@pytest.fixture(scope="module")
def shards(tmp_path_factory):
    root = tmp_path_factory.mktemp("wds")
    for s in range(3):
        _make_shard(str(root / f"shard{s}.tar"), n=10, start=s * 10)
    return str(root)


def test_iter_tar_samples(shards):
    samples = list(iter_tar_samples(f"{shards}/shard0.tar"))
    assert len(samples) == 10
    jpg, txt = samples[0]
    assert txt.decode().startswith("caption number")
    Image.open(io.BytesIO(jpg))  # decodable


def test_datamodule_batches(shards):
    dm = TextImageDataModule(shards, batch_size=4, image_size=32, context_length=16)
    assert len(dm.train_url) == 2 and len(dm.val_url) == 1
    batches = list(dm.train_dataloader(epoch=0))
    # 20 samples in 2 train shards -> 5 full batches (partial dropped)
    assert len(batches) == 5
    b = batches[0]
    assert b["images"].shape == (4, 32, 32, 3)
    assert b["tokens"].shape == (4, 16)
    assert b["tokens"].dtype == np.int32
    # val is deterministic across epochs
    v1 = list(dm.val_dataloader())
    v2 = list(dm.val_dataloader())
    np.testing.assert_array_equal(v1[0]["tokens"], v2[0]["tokens"])


def test_datamodule_requires_shards(tmp_path):
    with pytest.raises(ValueError):
        TextImageDataModule(str(tmp_path))
