"""Shared data utilities: dataset-name tables and teacher batch encoders.

Reference: data/component/utils.py.  The prepare-stage teacher encoders run
on whatever accelerator jax has (TPU when present) through OUR teacher
towers — the reference hardcodes CUDA + the external clip package
(utils.py:15-40).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from distillclip_tpu.data.transforms import IMAGE_MEAN, IMAGE_STD, eval_image_transform

IMAGE_DATASET_NAME = ["coco", "data_256", "imagenet"]
IMAGE_PREFIX = {"coco": "0", "data_256": "data_256", "imagenet": "imagenet"}


def encode_images(path_list: Sequence, teacher_name: str, download_root: Optional[str] = None,
                  batch_size: int = 64) -> np.ndarray:
    """Teacher image embeddings for a list of image paths -> [N, D] f32."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from distillclip_tpu.models import ControlFlags
    from distillclip_tpu.models.teacher import load_image_teacher

    module, variables = load_image_teacher(teacher_name, download_root)
    transform = eval_image_transform(module.input_resolution if hasattr(module, "input_resolution") else 224)

    @jax.jit
    def encode(imgs):
        return module.apply(variables, imgs, ControlFlags()).last_representation

    out = []
    for i in range(0, len(path_list), batch_size):
        chunk = path_list[i : i + batch_size]
        imgs = np.stack([transform(Image.open(str(p))) for p in chunk])
        # pad the tail chunk to the jitted batch shape
        pad = batch_size - len(chunk)
        if pad:
            imgs = np.concatenate([imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        reps = np.asarray(encode(jnp.asarray(imgs)))
        out.append(reps[: len(chunk)])
    return np.concatenate(out, axis=0).astype(np.float32)


def encode_tokens(tokens: np.ndarray, teacher_name: str,
                  download_root: Optional[str] = None,
                  batch_size: int = 512) -> np.ndarray:
    """Teacher text embeddings for an already-tokenized [N, L] array -> [N, D] f32.

    Used to pre-encode the stage-2 TRAIN corpus so the frozen teacher tower
    can be dropped from the train step (reference only pre-encodes val,
    combine_text_dataset.py:59-82; caching train reps is the same idea
    applied to the fixed train token tensor).
    """
    import jax
    import jax.numpy as jnp

    from distillclip_tpu.models import ControlFlags
    from distillclip_tpu.models.teacher import load_text_teacher

    module, variables = load_text_teacher(teacher_name, download_root)

    @jax.jit
    def encode(chunk):
        return module.apply(variables, chunk, ControlFlags()).last_representation

    out = []
    for i in range(0, len(tokens), batch_size):
        chunk = tokens[i : i + batch_size]
        pad = batch_size - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, chunk.shape[1]), chunk.dtype)])
        reps = np.asarray(encode(jnp.asarray(chunk)))
        out.append(reps[: batch_size - pad])
    return np.concatenate(out, axis=0).astype(np.float32)


def encode_texts(caption_list: Sequence[str], teacher_name: str,
                 download_root: Optional[str] = None, bpe_path: Optional[str] = None,
                 batch_size: int = 256) -> np.ndarray:
    """Teacher text embeddings for captions -> [N, D] f32."""
    import jax
    import jax.numpy as jnp

    from distillclip_tpu.data.tokenizer import build_tokenizer
    from distillclip_tpu.models import ControlFlags
    from distillclip_tpu.models.teacher import load_text_teacher

    module, variables = load_text_teacher(teacher_name, download_root)
    tokenizer = build_tokenizer(bpe_path, context_length=module.context_length)

    @jax.jit
    def encode(tokens):
        return module.apply(variables, tokens, ControlFlags()).last_representation

    out = []
    for i in range(0, len(caption_list), batch_size):
        chunk = list(caption_list[i : i + batch_size])
        tokens = tokenizer.tokenize(chunk, context_length=module.context_length)
        pad = batch_size - len(chunk)
        if pad:
            tokens = np.concatenate([tokens, np.zeros((pad, tokens.shape[1]), tokens.dtype)])
        reps = np.asarray(encode(jnp.asarray(tokens)))
        out.append(reps[: len(chunk)])
    return np.concatenate(out, axis=0).astype(np.float32)
