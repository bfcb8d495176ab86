"""Plain-attention kernel A/B at live-teacher shapes (fenced).

Times L fwd-only layers of plain non-causal attention on [B*Np, 3*HD]
rows-qkv operands: packed vs colcat-identity vs blockdiag.
Usage: python .bench/micro_plain_attn.py [--grad]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from distillclip_tpu import runtime

runtime.setup_cache()

p = argparse.ArgumentParser()
p.add_argument("--grad", action="store_true")
p.add_argument("--B", type=int, default=256)
p.add_argument("--layers", type=int, default=12)
args = p.parse_args()

B, h, d, Np, n, L = args.B, 12, 64, 64, 50, args.layers
HD = h * d
rng = np.random.default_rng(0)
qkv = jnp.asarray(rng.normal(size=(B * Np, 3 * HD)).astype(np.float32) * 0.3,
                  jnp.bfloat16)


def run(mode):
    os.environ["DISTILLCLIP_PLAIN_ATTN"] = mode
    from distillclip_tpu.ops.flash_attention import flash_attention_rows_qkv

    def tower(x):
        for _ in range(L):
            o = flash_attention_rows_qkv(x[:, :3 * HD], heads=h, seq=Np,
                                         kv_len=n)
            # chain layers through a cheap mix so attention dominates
            x = jnp.concatenate([o, o, o], axis=1) + x
        return jnp.sum(x.astype(jnp.float32))

    fn = jax.jit(jax.grad(tower) if args.grad else tower)
    r = fn(qkv)
    np.asarray(jax.tree_util.tree_leaves(r)[0])  # fence
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        r = fn(qkv)
        np.asarray(jax.tree_util.tree_leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    best = min(ts) * 1e3
    print(f"{mode:10s} {'f+b' if args.grad else 'fwd'} "
          f"{L}L B={B}: {best:.2f} ms  ({best / L:.3f} ms/layer)")
    return best


for mode in ("packed", "colcat", "blockdiag"):
    run(mode)
