"""Native (C++) image decode pipeline vs PIL reference."""

import os
import subprocess

import numpy as np
import pytest
from PIL import Image

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


@pytest.fixture(scope="module")
def lib_built():
    so = os.path.join(NATIVE_DIR, "libdcloader.so")
    if not os.path.exists(so):
        r = subprocess.run(["make", "-C", NATIVE_DIR], capture_output=True, text=True)
        if r.returncode != 0:
            pytest.skip(f"native build unavailable: {r.stderr[-200:]}")
    return so


@pytest.fixture()
def jpeg_file(tmp_path):
    y, x = np.mgrid[0:300, 0:400]
    img = np.stack([(x * 255 / 400), (y * 255 / 300), ((x + y) * 255 / 700)], -1).astype(np.uint8)
    p = tmp_path / "grad.jpg"
    Image.fromarray(img).save(str(p), quality=95)
    return str(p)


def test_native_matches_pil(lib_built, jpeg_file):
    from distillclip_tpu.data import native_loader as nl
    from distillclip_tpu.data.transforms import eval_image_transform

    assert nl.available()
    out = nl.decode_batch_files([jpeg_file] * 3, size=224, num_threads=2)
    assert out.shape == (3, 224, 224, 3)
    ref = eval_image_transform(224)(Image.open(jpeg_file))
    # smooth content: area-averaged native resize tracks PIL bicubic closely
    assert np.abs(out[0] - ref).mean() < 0.02
    np.testing.assert_array_equal(out[0], out[1])


def test_native_buffers_match_files(lib_built, jpeg_file):
    from distillclip_tpu.data import native_loader as nl

    with open(jpeg_file, "rb") as f:
        buf = f.read()
    a = nl.decode_batch_files([jpeg_file], size=96)
    b = nl.decode_batch_buffers([buf], size=96)
    np.testing.assert_array_equal(a, b)


def test_native_bad_input_falls_back(lib_built, tmp_path):
    from distillclip_tpu.data import native_loader as nl

    png = tmp_path / "img.png"
    Image.fromarray(np.zeros((64, 64, 3), np.uint8) + 128).save(str(png))
    out = nl.decode_batch_files([str(png)], size=32)
    # PNG fails native JPEG decode, PIL fallback fills it
    assert np.abs(out).sum() > 0


def test_native_raw_decode_uint8(lib_built, jpeg_file):
    """Raw decode (train path): uint8 RGB, resize/crop matches the
    normalized pipeline when re-normalized on host."""
    from distillclip_tpu.data.native_loader import decode_batch_files, decode_raw_file
    from distillclip_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD

    raw = decode_raw_file(jpeg_file, 224)
    assert raw is not None and raw.shape == (224, 224, 3) and raw.dtype == np.uint8
    normalized = decode_batch_files([jpeg_file], 224)[0]
    renorm = (raw.astype(np.float32) / 255.0 - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(
        IMAGE_STD, np.float32
    )
    # uint8 quantization: within one pixel step of the float pipeline
    assert np.abs(renorm - normalized).max() < 1.5 / 255.0 / min(IMAGE_STD)


def test_native_raw_decode_missing_file(lib_built, tmp_path):
    from distillclip_tpu.data.native_loader import decode_raw_file

    assert decode_raw_file(str(tmp_path / "nope.jpg"), 224) is None


def test_combine_image_dataset_native_and_uint8(lib_built, tmp_path):
    """Train items through the native decode + RandAugment path, both
    normalized-f32 and device-normalize uint8 modes."""
    from distillclip_tpu.data.component.combine_image_dataset import CombineImageDataset

    rng = np.random.default_rng(0)
    for i in range(4):
        arr = rng.integers(0, 255, size=(224, 224, 3), dtype=np.uint8)
        Image.fromarray(arr).save(str(tmp_path / f"{i:012d}.jpg"), quality=90)

    ds = CombineImageDataset(str(tmp_path), train=True, image_use=["coco"])
    item = ds[0]
    assert item["inputs"].shape == (224, 224, 3)
    assert item["inputs"].dtype == np.float32

    ds8 = CombineImageDataset(
        str(tmp_path), train=True, image_use=["coco"], device_normalize=True
    )
    item8 = ds8[0]
    assert item8["inputs"].dtype == np.uint8
    assert item8["inputs"].shape == (224, 224, 3)

    # PIL fallback path also honors device_normalize
    ds8p = CombineImageDataset(
        str(tmp_path), train=True, image_use=["coco"],
        use_native_decode=False, device_normalize=True,
    )
    assert ds8p[1]["inputs"].dtype == np.uint8
