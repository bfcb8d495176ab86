"""L-CLIPScore batch inference — the serving path.

The reference's inference fast path is CLIPModel(only_last_rep=True)
(clip_model.py:45-49), wired via teacher_load(..., only_last_rep)
(model/utils.py:169): encode image + caption, L2-normalize, cosine.

Here that is a pair of jitted encoder applications with static batch
buckets (pad-to-bucket keeps XLA from recompiling per request size) and a
fused cosine kernel.  Throughput path: images arrive as NHWC uint8/float,
text as tokens; per-pair score = cos(image_feature, text_feature).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from distillclip_tpu.models import ControlFlags
from distillclip_tpu.models.clip import l2_normalize

_BUCKETS = (1, 8, 64, 256, 1024)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + _BUCKETS[-1] - 1) // _BUCKETS[-1]) * _BUCKETS[-1]


def _pad_to_bucket(arr: np.ndarray, b: int) -> np.ndarray:
    """Zero-pad the batch dim up to the static bucket size ``b``."""
    n = len(arr)
    if b == n:
        return arr
    return np.concatenate(
        [arr, np.zeros((b - n,) + np.shape(arr)[1:], np.asarray(arr).dtype)]
    )


@dataclasses.dataclass
class LCLIPScorer:
    image_module: Any
    image_vars: Any
    text_module: Any
    text_vars: Any
    tokenizer: Any
    image_size: int = 224
    context_length: int = 77
    compute_dtype: Any = jnp.bfloat16

    def __post_init__(self):
        from distillclip_tpu.training.train_state import cast_to_compute

        # Cast weights to the compute dtype ONCE (fp32 LN internals are
        # preserved by the modules themselves): applying raw fp32 params
        # promotes every matmul to f32 — measured 141 ms vs ~15 ms for the
        # bucket-256 bf16 encode on v5e.  Then commit them to device ONCE:
        # serving calls must transfer only the request tensors, never the
        # ~hundreds of weight buffers (each host buffer would otherwise be
        # re-uploaded per jitted call — measured 100+ s/call through a
        # remote-backend tunnel).
        self.image_vars = jax.device_put(
            cast_to_compute(self.image_vars, self.compute_dtype))
        self.text_vars = jax.device_put(
            cast_to_compute(self.text_vars, self.compute_dtype))
        flags = ControlFlags()

        @jax.jit
        def encode_image(variables, images):
            # uint8 requests are normalized ON DEVICE ((x/255-mean)/std,
            # same arithmetic as the training input path,
            # train_state.prepare_inputs) — 4x less host->device transfer
            # than normalized fp32; float inputs pass through pre-normalized
            from distillclip_tpu.training.train_state import prepare_inputs

            out = self.image_module.apply(
                variables, prepare_inputs(images, self.compute_dtype), flags,
                deterministic=True,
            )
            return l2_normalize(out.last_representation.astype(jnp.float32))

        @jax.jit
        def encode_text(variables, tokens):
            out = self.text_module.apply(variables, tokens, flags, deterministic=True)
            return l2_normalize(out.last_representation.astype(jnp.float32))

        @jax.jit
        def score_pairs(img_variables, txt_variables, images, tokens):
            # one fused program: image encode + text encode + cosine.  One
            # dispatch + one readback per request instead of three — on a
            # remote (tunneled) backend each dispatch is a network round
            # trip that dwarfs the compute (BENCH_NOTES round 4); on a
            # colocated host it still halves dispatch overhead.
            img_f = encode_image(img_variables, images)
            txt_f = encode_text(txt_variables, tokens)
            return jnp.sum(img_f * txt_f, axis=1)

        self._encode_image = encode_image
        self._encode_text = encode_text
        self._score_pairs = score_pairs

    # -- builders -----------------------------------------------------------

    @classmethod
    def from_teacher(cls, teacher_name: str = "ViT-B/32", download_root: str = "./.cache",
                     bpe_path: Optional[str] = None):
        """Score with the full CLIP teacher (reference CLIPScore baseline)."""
        from distillclip_tpu.data.tokenizer import build_tokenizer
        from distillclip_tpu.models.teacher import load_image_teacher, load_text_teacher

        img_mod, img_vars = load_image_teacher(teacher_name, download_root)
        txt_mod, txt_vars = load_text_teacher(teacher_name, download_root)
        ctx = getattr(txt_mod, "context_length", 77)
        size = getattr(img_mod, "input_resolution", 224)
        vocab = getattr(txt_mod, "vocab_size", 49408)
        return cls(
            image_module=img_mod, image_vars=img_vars,
            text_module=txt_mod, text_vars=txt_vars,
            tokenizer=build_tokenizer(bpe_path, context_length=ctx, vocab_size=vocab),
            image_size=size, context_length=ctx,
        )

    @classmethod
    def from_checkpoints(cls, image_ckpt: Optional[str] = None,
                         text_ckpt: Optional[str] = None,
                         config: Optional[str] = None,
                         bpe_path: Optional[str] = None,
                         teacher_name: str = "ViT-B/32",
                         download_root: str = "./.cache"):
        """Build student towers from a config YAML and restore stage ckpts.

        Without checkpoints this degrades to the CLIP-teacher scorer.
        """
        image_ckpt = image_ckpt or None
        text_ckpt = text_ckpt or None
        if image_ckpt is None and text_ckpt is None:
            return cls.from_teacher(teacher_name, download_root, bpe_path)
        if config is None:
            raise ValueError(
                "score with student checkpoints needs --config (the stage-3 "
                "YAML describing the student tower architectures)"
            )

        import jax.random as jrandom
        import yaml

        from distillclip_tpu.config import instantiate
        from distillclip_tpu.data.tokenizer import build_tokenizer
        from distillclip_tpu.training.checkpoints import restore_tower_params

        with open(config) as f:
            cfg = yaml.safe_load(f)
        init_args = cfg["model"]["init_args"]
        image_tower = instantiate(init_args["image_student"])
        text_tower = instantiate(init_args["text_student"])

        image_size = getattr(image_tower, "img_size", getattr(image_tower, "input_resolution", 224))
        ctx = getattr(text_tower, "context_length", 77)
        rng = jrandom.PRNGKey(0)
        img_params = image_tower.init(
            rng, jnp.zeros((1, image_size, image_size, 3), jnp.float32), ControlFlags()
        )["params"]
        txt_params = text_tower.init(
            rng, jnp.zeros((1, ctx), jnp.int32), ControlFlags()
        )["params"]
        # tower= selects out of a stage-3 dual checkpoint; stage-1/2 single-
        # tower checkpoints are unaffected (no such key inside)
        img_params = restore_tower_params(image_ckpt, img_params, tower="image_tower")
        txt_params = restore_tower_params(text_ckpt, txt_params, tower="text_tower")
        vocab = getattr(text_tower, "vocab_size", 49408)
        return cls(
            image_module=image_tower, image_vars={"params": img_params},
            text_module=text_tower, text_vars={"params": txt_params},
            tokenizer=build_tokenizer(bpe_path, context_length=ctx, vocab_size=vocab),
            image_size=image_size, context_length=ctx,
        )

    # -- scoring ------------------------------------------------------------

    def encode_images(self, images: np.ndarray) -> np.ndarray:
        n = len(images)
        images = _pad_to_bucket(images, _bucket(n))
        feats = self._encode_image(self.image_vars, jnp.asarray(images))
        return np.asarray(feats)[:n]

    def encode_tokens(self, tokens: np.ndarray) -> np.ndarray:
        """Encode pre-tokenized captions (server fast path: tokenization is
        host work the caller can pipeline; the device leg starts here)."""
        n = len(tokens)
        tokens = _pad_to_bucket(tokens, _bucket(n))
        feats = self._encode_text(self.text_vars, jnp.asarray(tokens))
        return np.asarray(feats)[:n]

    def encode_captions(self, captions: Sequence[str]) -> np.ndarray:
        return self.encode_tokens(
            self.tokenizer.tokenize(list(captions), context_length=self.context_length)
        )

    def score_arrays(self, images: np.ndarray, captions: Sequence[str]) -> np.ndarray:
        """Per-pair cosine L-CLIPScore for aligned (image, caption) lists."""
        img_f = self.encode_images(images)
        txt_f = self.encode_captions(captions)
        return np.sum(img_f * txt_f, axis=1)

    def score_tokens(self, images: np.ndarray, tokens: np.ndarray) -> np.ndarray:
        """Per-pair cosine for preprocessed images + pre-tokenized captions.

        The aligned-pair fast path: both inputs pad to the same bucket and
        run as ONE fused device program (see score_pairs in __post_init__).
        """
        n = len(images)
        assert len(tokens) == n, "score_tokens expects aligned (image, token) pairs"
        b = _bucket(n)
        images = _pad_to_bucket(images, b)
        tokens = _pad_to_bucket(tokens, b)
        scores = self._score_pairs(
            self.image_vars, self.text_vars, jnp.asarray(images), jnp.asarray(tokens)
        )
        return np.asarray(scores)[:n]

    def score_tokens_stream(self, batches, depth: int = 2):
        """Pipelined scoring of a stream of (images, tokens) buckets.

        Transfers and compute for bucket i+1 are DISPATCHED before bucket
        i's scores are read back, so the host->device copy and the fused
        scorer overlap (double-buffering; ``depth`` buckets in flight).
        Serial ``score_tokens`` calls serialize transfer -> compute ->
        readback per bucket; on hosts where transfer is comparable to
        compute that wastes up to half the device (VERDICT r4 item 7).
        Yields one np.ndarray of scores per input bucket, in order.

        Reference inference surface being served:
        CLIPModel(only_last_rep=True), clip_model.py:45-49.
        """
        from collections import deque

        inflight = deque()
        for images, tokens in batches:
            n = len(images)
            b = _bucket(n)
            images = _pad_to_bucket(images, b)
            tokens = _pad_to_bucket(tokens, b)
            # async: device_put + the fused program dispatch return
            # immediately; the readback below fences only the OLDEST bucket
            d_imgs = jax.device_put(images)
            d_toks = jax.device_put(tokens)
            scores = self._score_pairs(
                self.image_vars, self.text_vars, d_imgs, d_toks
            )
            inflight.append((scores, n))
            if len(inflight) >= depth:
                s, m = inflight.popleft()
                yield np.asarray(s)[:m]
        while inflight:
            s, m = inflight.popleft()
            yield np.asarray(s)[:m]

    def score_files(self, image_paths: Sequence[str], captions: Sequence[str]) -> np.ndarray:
        from distillclip_tpu.data import native_loader

        if native_loader.available():
            # C++ threaded JPEG decode pipeline (native/dataloader.cc)
            images = native_loader.decode_batch_files(
                [str(p) for p in image_paths], size=self.image_size
            )
        else:
            from PIL import Image

            from distillclip_tpu.data.transforms import eval_image_transform

            transform = eval_image_transform(self.image_size)
            images = np.stack([transform(Image.open(str(p))) for p in image_paths])
        return self.score_arrays(images, captions)

    def similarity_matrix(self, images: np.ndarray, captions: Sequence[str]) -> np.ndarray:
        """[N_img, N_txt] cosine matrix (retrieval-style scoring)."""
        img_f = self.encode_images(images)
        txt_f = self.encode_captions(captions)
        return img_f @ txt_f.T
