"""Host-side image transforms: resize/center-crop/normalize + RandAugment.

TPU-native equivalents of the reference's torchvision transform stacks
(data/component/ms_coco.py:16-27, combine_image_dataset.py:97-110) and its
vendored RandAugment (data/component/rand_augment.py).  Implemented on PIL
(no torchvision in this environment); output is HWC float32 numpy in the
TPU-native NHWC layout.

CLIP normalization constants: data/component/utils.py:11-12.
"""

from __future__ import annotations

import math
import random
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)

_BICUBIC = Image.BICUBIC
_NEAREST = Image.NEAREST


def resize_shorter(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(size): scale shorter side to ``size``."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), _BICUBIC)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    if left < 0 or top < 0:  # pad-then-crop for small images
        padded = Image.new(img.mode, (max(w, size), max(h, size)))
        padded.paste(img, ((max(w, size) - w) // 2, (max(h, size) - h) // 2))
        img, (w, h) = padded, padded.size
        left = (w - size) // 2
        top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def to_normalized_array(img: Image.Image) -> np.ndarray:
    """PIL -> HWC float32, CLIP-normalized."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return (arr - np.asarray(IMAGE_MEAN, np.float32)) / np.asarray(IMAGE_STD, np.float32)


# ---------------------------------------------------------------------------
# RandAugment (reference rand_augment.py:90-166; torchvision op space)
# ---------------------------------------------------------------------------


def _affine(img, matrix):
    return img.transform(img.size, Image.AFFINE, matrix, resample=_NEAREST)


def _apply_op(img: Image.Image, op_name: str, magnitude: float) -> Image.Image:
    W, H = img.size
    if op_name == "ShearX":
        return _affine(img, (1, -magnitude, 0, 0, 1, 0))
    if op_name == "ShearY":
        return _affine(img, (1, 0, 0, -magnitude, 1, 0))
    if op_name == "TranslateX":
        return _affine(img, (1, 0, -int(magnitude), 0, 1, 0))
    if op_name == "TranslateY":
        return _affine(img, (1, 0, 0, 0, 1, -int(magnitude)))
    if op_name == "Rotate":
        return img.rotate(magnitude, resample=_NEAREST)
    if op_name == "Brightness":
        return ImageEnhance.Brightness(img).enhance(1.0 + magnitude)
    if op_name == "Color":
        return ImageEnhance.Color(img).enhance(1.0 + magnitude)
    if op_name == "Contrast":
        return ImageEnhance.Contrast(img).enhance(1.0 + magnitude)
    if op_name == "Sharpness":
        return ImageEnhance.Sharpness(img).enhance(1.0 + magnitude)
    if op_name == "Posterize":
        return ImageOps.posterize(img, int(magnitude))
    if op_name == "Solarize":
        return ImageOps.solarize(img, int(magnitude))
    if op_name == "AutoContrast":
        return ImageOps.autocontrast(img)
    if op_name == "Equalize":
        return ImageOps.equalize(img)
    if op_name == "Invert":
        return ImageOps.invert(img)
    if op_name == "Identity":
        return img
    raise ValueError(f"unknown RandAugment op {op_name}")


class RandAugment:
    """Torchvision-style RandAugment: num_ops random ops at a fixed
    magnitude bin (reference vendored copy, rand_augment.py:90-166)."""

    def __init__(self, num_ops: int = 2, magnitude: int = 9, num_magnitude_bins: int = 31,
                 rng: Optional[random.Random] = None):
        self.num_ops = num_ops
        self.magnitude = magnitude
        self.num_bins = num_magnitude_bins
        self.rng = rng or random.Random()

    def _space(self, image_size: Tuple[int, int]):
        W, H = image_size
        n = self.num_bins
        lin = lambda hi: np.linspace(0.0, hi, n)
        return {
            "Identity": (np.zeros(n), False),
            "ShearX": (lin(0.3), True),
            "ShearY": (lin(0.3), True),
            "TranslateX": (lin(150.0 / 331.0 * W), True),
            "TranslateY": (lin(150.0 / 331.0 * H), True),
            "Rotate": (lin(30.0), True),
            "Brightness": (lin(0.9), True),
            "Color": (lin(0.9), True),
            "Contrast": (lin(0.9), True),
            "Sharpness": (lin(0.9), True),
            "Posterize": (8 - (np.arange(n) / ((n - 1) / 4)).round(), False),
            "Solarize": (np.linspace(255.0, 0.0, n), False),
            "AutoContrast": (np.zeros(n), False),
            "Equalize": (np.zeros(n), False),
        }

    def __call__(self, img: Image.Image) -> Image.Image:
        space = self._space(img.size)
        names = list(space.keys())
        for _ in range(self.num_ops):
            name = names[self.rng.randrange(len(names))]
            magnitudes, signed = space[name]
            mag = float(magnitudes[self.magnitude]) if magnitudes.ndim else 0.0
            if signed and self.rng.random() < 0.5:
                mag = -mag
            img = _apply_op(img, name, mag)
        return img


def train_image_transform(size: int = 224, rand_augment_ops: int = 4,
                          rng: Optional[random.Random] = None):
    """resize -> center crop -> RandAugment(4) -> normalize
    (ms_coco.py:16-22)."""
    ra = RandAugment(num_ops=rand_augment_ops, rng=rng)

    def apply(img: Image.Image) -> np.ndarray:
        img = center_crop(resize_shorter(img.convert("RGB"), size), size)
        img = ra(img)
        return to_normalized_array(img)

    return apply


def eval_image_transform(size: int = 224):
    """resize -> center crop -> normalize (ms_coco.py:23-27)."""

    def apply(img: Image.Image) -> np.ndarray:
        return to_normalized_array(center_crop(resize_shorter(img.convert("RGB"), size), size))

    return apply
