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
