"""Host input-pipeline throughput (BASELINE.md's mandatory metric list).

Measures, on the fabricated JPEG corpus (zero-egress stand-in with real
JPEG decode cost):

* native libjpeg decode (+resize/crop in C++) -> RandAugment -> collate
  images/s, per worker-thread count, in both wire formats (uint8 device-
  normalize vs host-normalized fp32) and without augmentation (the
  cached-teacher deviation's pixel path);
* tokenizer captions/s (native C++ BPE vs pure-Python), batch tokenize.

The reference feeds 1024 img/step through torch DataLoader workers
(reference data/main_datamodule.py:53-61); this tool answers "how many
host cores does the rebuilt pipeline need to sustain the measured device
rate" — divide the target img/s by the per-thread rate.

    python -m distillclip_tpu.tools.input_bench
    python -m distillclip_tpu.tools.input_bench --threads 1 2 4 --n 512

Results are recorded in BENCH_NOTES.md and surfaced in bench.py's
``detail.input_pipeline`` (--input leg).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def bench_images(corpus: str, n: int, threads_list, image_size: int = 224):
    """items/s through CombineImageDataset -> DataLoader per thread count."""
    from distillclip_tpu.data.component.combine_image_dataset import (
        CombineImageDataset,
    )
    from distillclip_tpu.data.loader import DataLoader

    out = {}
    variants = (
        ("uint8_augment", dict(device_normalize=True, augment_train=True)),
        ("f32_augment", dict(device_normalize=False, augment_train=True)),
        ("uint8_noaugment", dict(device_normalize=True, augment_train=False)),
    )
    for name, kw in variants:
        ds = CombineImageDataset(
            combine_dataset_path=os.path.join(corpus, "combined"),
            train=True, image_use=["coco", "imagenet"],
            image_size=image_size, use_native_decode=True, **kw,
        )
        n_eff = min(n, len(ds))
        per_threads = {}
        for t in threads_list:
            loader = DataLoader(ds, batch_size=64, shuffle=False,
                                drop_last=False, num_threads=t)
            # warm one batch (thread spin-up, native lib load)
            it = iter(loader)
            next(it)
            t0 = time.perf_counter()
            seen = 64
            for batch in it:
                seen += len(batch["inputs"])
                if seen >= n_eff:
                    break
            dt = time.perf_counter() - t0
            per_threads[str(t)] = round((seen - 64) / dt, 1)
        out[name] = per_threads
    return out


def _fabricated_merges(path: str, n: int = 2000) -> str:
    """Synthetic BPE merges table (zero-egress stand-in for the CLIP
    vocab): adjacent-letter pair merges so the merge loop does real work;
    a cost proxy, not the real vocabulary."""
    import gzip
    import itertools
    import string

    if os.path.exists(path):
        return path
    lines = ["#version: fabricated"]
    for a, b in itertools.product(string.ascii_lowercase, repeat=2):
        lines.append(f"{a} {b}")
        lines.append(f"{a} {b}</w>")
        if len(lines) > n:
            break
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    return path


def bench_tokenizer(n: int = 20000):
    """captions/s: native C++ BPE vs pure-Python, batch tokenize."""
    from distillclip_tpu.data.tokenizer import SimpleTokenizer

    bpe = _fabricated_merges(os.path.join(".cache", "input_bench_merges.txt.gz"))
    captions = [
        f"a photo of number {i} with a {w}"
        for i, w in zip(range(n), ["dog", "cat", "bus", "tree", "boat"] * (n // 5 + 1))
    ]
    out = {}
    for name, native in (("native", True), ("python", False)):
        try:
            tok = SimpleTokenizer(bpe, merge_limit=None, use_native=native)
        except Exception as e:
            out[name] = f"unavailable: {type(e).__name__}"
            continue
        tok.tokenize(captions[:64], context_length=77)  # warm
        t0 = time.perf_counter()
        tok.tokenize(captions, context_length=77)
        dt = time.perf_counter() - t0
        out[name] = round(n / dt, 1)
    return out


def run(corpus: str = None, n: int = 512, threads_list=(1, 2, 4),
        image_size: int = 224, n_captions: int = 20000):
    from distillclip_tpu.tools.fabricate_images import fabricate

    n_fab = max(n, 512)
    if corpus is None:
        # keyed by geometry: a 64px quick-run corpus must never be
        # silently re-measured as the 224px decode cost (reviewer r5)
        corpus = os.path.join(
            ".cache", f"input_bench_corpus_{image_size}px_{n_fab}")
    if not os.path.exists(os.path.join(corpus, "combined")):
        fabricate(corpus, n_train=n_fab, n_val=8, size=image_size)

    images = bench_images(corpus, n, list(threads_list), image_size)
    tokens = bench_tokenizer(n_captions)
    # per-thread scaling summary: this box has one core, so >1 thread
    # mostly measures GIL/native-release behavior; the per-thread rate is
    # the planning number (host cores needed = target / per_thread)
    base = images["uint8_augment"].get(str(threads_list[0]))
    return {
        "images_per_s": images,
        "captions_per_s": tokens,
        "host_cores_for_4500_img_s": (
            round(4500.0 / base, 1) if base else None
        ),
        "corpus": corpus,
        "note": "fabricated JPEGs (real libjpeg decode cost); "
                "single-core host — per-thread rate is the planning number",
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None)
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--threads", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--captions", type=int, default=20000)
    args = ap.parse_args(argv)
    res = run(args.corpus, args.n, args.threads, args.image_size, args.captions)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
