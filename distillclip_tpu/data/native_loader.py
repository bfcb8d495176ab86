"""ctypes bindings for the native (C++) image decode pipeline.

Loads ``native/libdcloader.so`` (threaded libjpeg decode + bilinear
resize/center-crop + CLIP normalization) and exposes batch decoding with a
transparent PIL fallback when the library is absent or an image is not a
JPEG.  See native/dataloader.cc.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

from distillclip_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD

_LIB = None
_SEARCHED = False


def _find_lib() -> Optional[str]:
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    candidates = [
        os.environ.get("DCLOADER_PATH") or "",
        os.path.join(here, "native", "libdcloader.so"),
        os.path.join(os.path.dirname(__file__), "libdcloader.so"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None


def load_library():
    global _LIB, _SEARCHED
    if _LIB is not None or _SEARCHED:
        return _LIB
    _SEARCHED = True
    path = _find_lib()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.dc_decode_batch_files.restype = ctypes.c_int
    lib.dc_decode_batch_files.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.dc_decode_batch_buffers.restype = ctypes.c_int
    lib.dc_decode_batch_buffers.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    if hasattr(lib, "dc_decode_raw_file"):
        lib.dc_decode_raw_file.restype = ctypes.c_int
        lib.dc_decode_raw_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
        ]
    _LIB = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _mean_std_ptrs():
    mean = np.asarray(IMAGE_MEAN, np.float32)
    std = np.asarray(IMAGE_STD, np.float32)
    return (
        mean,
        std,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )


def decode_batch_files(
    paths: Sequence[str], size: int = 224, num_threads: int = 8
) -> np.ndarray:
    """[N, size, size, 3] float32 CLIP-normalized NHWC batch from JPEG files.

    Falls back to PIL per-file on native failure (e.g. PNG input).
    """
    lib = load_library()
    n = len(paths)
    out = np.zeros((n, size, size, 3), np.float32)
    if lib is None:
        return _pil_batch(paths, size, out)
    mean, std, mp, sp = _mean_std_ptrs()
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.dc_decode_batch_files(
        arr, n, size, mp, sp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        num_threads,
    )
    if failures:
        # retry zero rows with PIL (non-JPEG formats)
        zero_rows = np.where(np.abs(out).sum(axis=(1, 2, 3)) == 0)[0]
        _pil_batch([paths[i] for i in zero_rows], size, out, rows=zero_rows)
    return out


def decode_batch_buffers(
    buffers: List[bytes], size: int = 224, num_threads: int = 8
) -> np.ndarray:
    lib = load_library()
    n = len(buffers)
    out = np.zeros((n, size, size, 3), np.float32)
    if lib is None:
        return _pil_buffer_batch(buffers, size, out)
    mean, std, mp, sp = _mean_std_ptrs()
    arr = (ctypes.c_char_p * n)(*buffers)
    lens = (ctypes.c_size_t * n)(*[len(b) for b in buffers])
    failures = lib.dc_decode_batch_buffers(
        arr, lens, n, size, mp, sp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads,
    )
    if failures:
        zero_rows = np.where(np.abs(out).sum(axis=(1, 2, 3)) == 0)[0]
        _pil_buffer_batch([buffers[i] for i in zero_rows], size, out, rows=zero_rows)
    return out


def decode_raw_file(path: str, size: int = 224) -> Optional[np.ndarray]:
    """One JPEG file -> uint8 RGB [size, size, 3] (resize shorter side +
    center crop, no normalization) via the native pipeline.

    Returns None when the library is absent or decode fails (caller falls
    back to PIL).  Used by the TRAIN path, where RandAugment must see
    pre-normalization pixels (reference augments PIL images,
    combine_image_dataset.py:97-110).
    """
    lib = load_library()
    if lib is None or not hasattr(lib, "dc_decode_raw_file"):
        return None
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.dc_decode_raw_file(
        path.encode(), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out if rc == 0 else None


def _pil_batch(paths, size, out, rows=None):
    from PIL import Image

    from distillclip_tpu.data.transforms import eval_image_transform

    tf = eval_image_transform(size)
    rows = range(len(paths)) if rows is None else rows
    for row, p in zip(rows, paths):
        try:
            out[row] = tf(Image.open(p))
        except Exception:
            pass
    return out


def _pil_buffer_batch(buffers, size, out, rows=None):
    import io

    from PIL import Image

    from distillclip_tpu.data.transforms import eval_image_transform

    tf = eval_image_transform(size)
    rows = range(len(buffers)) if rows is None else rows
    for row, b in zip(rows, buffers):
        try:
            out[row] = tf(Image.open(io.BytesIO(b)))
        except Exception:
            pass
    return out
