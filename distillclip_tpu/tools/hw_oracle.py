"""Hardware oracle: verify every default kernel path against XLA f32 ON TPU.

Interpret mode is not sufficient evidence of kernel correctness — round 4
found a Mosaic write-after-read mis-schedule in the packed rows kernel
that was exact under interpret and silently wrong on hardware (BENCH_NOTES
"Round-4 correctness find").  This tool runs forward AND backward oracles
for each default kernel family on the real backend and fails loudly on
disagreement beyond bf16-accumulation tolerances:

    python -m distillclip_tpu.tools.hw_oracle          # all checks
    python -m distillclip_tpu.tools.hw_oracle --only transform

Run it after touching any Pallas kernel, before trusting a training run.
"""

from __future__ import annotations

import argparse
import importlib
import sys

import numpy as np


def _setup():
    from distillclip_tpu.runtime import setup_cache

    setup_cache()


def _rel(a, b):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max()), float(np.abs(a - b).max() / scale)


def check_plain(results):
    """Packed rows + blockdiag vs XLA reference (causal and not)."""
    import jax
    import jax.numpy as jnp

    fa = importlib.import_module("distillclip_tpu.ops.flash_attention")
    bd = importlib.import_module("distillclip_tpu.ops.blockdiag_attention")

    def ref(qkvf, B, N, H, d, causal):
        HD = H * d
        x = qkvf.astype(jnp.float32).reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
        q, k, v = x[0], x[1], x[2]
        s = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
        if causal:
            i = jnp.arange(N)[:, None]
            j = jnp.arange(N)[None, :]
            s = jnp.where(j <= i, s, -1e9)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B * N, HD)

    for H, d, N, B, causal in [(12, 64, 64, 8, False), (8, 64, 80, 8, True)]:
        HD = H * d
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.normal(size=(B * N, 3 * HD)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        r = np.asarray(jax.jit(lambda x: ref(x, B, N, H, d, causal))(qkv))
        loss = lambda fn: (lambda a: jnp.sum(jnp.sin(fn(a).astype(jnp.float32))))
        gr = np.asarray(jax.jit(jax.grad(loss(
            lambda x: ref(x, B, N, H, d, causal))))(qkv), np.float32)
        for name, kern in (
            ("blockdiag", lambda a: bd.blockdiag_attention_rows_qkv(
                a, heads=H, seq=N, causal=causal)),
            ("packed", lambda a: fa._flash_rows(
                a, 1.0 / np.sqrt(d), causal, 2, N, H, d, N)),
        ):
            o = np.asarray(jax.jit(kern)(qkv)).astype(np.float32)
            g = np.asarray(jax.jit(jax.grad(loss(kern)))(qkv), np.float32)
            fe, _ = _rel(o, r)
            ge, grel = _rel(g, gr)
            results.append((f"{name} H={H} d={d} causal={causal}",
                            fe, ge, fe < 0.02 and grel < 0.02))


def check_transform(results):
    """Colcat transform attention fwd + all three grads."""
    import jax
    import jax.numpy as jnp

    ta = importlib.import_module("distillclip_tpu.ops.transform_attention")

    def ref(qkv, wl, ww, B, N, H, d):
        HD = H * d
        x = qkv.astype(jnp.float32).reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
        q, k, v = x[0], x[1], x[2]
        s = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
        s = jnp.einsum("hg,bgij->bhij", wl.astype(jnp.float32), s)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.einsum("hg,bgij->bhij", ww.astype(jnp.float32), p)
        o = jnp.einsum("bhij,bhjd->bhid", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B * N, HD)

    for H, d, N, B, tag in [(24, 32, 64, 8, "image"), (12, 64, 80, 8, "text")]:
        HD = H * d
        rng = np.random.default_rng(0)
        qkv = jnp.asarray(
            rng.normal(size=(B * N, 3 * HD)).astype(np.float32) * 0.3
        ).astype(jnp.bfloat16)
        wl = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
        ww = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
        kern = lambda x, l, w: ta.transform_attention_rows_qkv(x, l, w, heads=H, seq=N)
        refc = lambda x, l, w: ref(x, l, w, B, N, H, d)
        o = np.asarray(jax.jit(kern)(qkv, wl, ww)).astype(np.float32)
        r = np.asarray(jax.jit(refc)(qkv, wl, ww))
        loss = lambda fn: (lambda x, l, w: jnp.sum(jnp.sin(fn(x, l, w).astype(jnp.float32))))
        g = jax.jit(jax.grad(loss(kern), argnums=(0, 1, 2)))(qkv, wl, ww)
        gr = jax.jit(jax.grad(loss(refc), argnums=(0, 1, 2)))(qkv, wl, ww)
        fe, _ = _rel(o, r)
        ok = fe < 0.02
        worst = 0.0
        for a, b in zip(g, gr):
            _, rel = _rel(a, b)
            worst = max(worst, rel)
            ok = ok and rel < 0.02
        results.append((f"transform {tag} H={H} d={d}", fe, worst, ok))


def check_fc1(results):
    """Fused LN+fc1+gelu fwd + dx/dw."""
    import jax
    import jax.numpy as jnp

    fc = importlib.import_module("distillclip_tpu.ops.fc1_act")

    rng = np.random.default_rng(1)
    rows, C, Hd = 512, 256, 1024
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(jnp.bfloat16)
    ls = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32)).astype(jnp.bfloat16)
    lb = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(C, Hd)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    b = jnp.asarray(0.1 * rng.normal(size=(Hd,)).astype(np.float32)).astype(jnp.bfloat16)

    def ref(x, ls, lb, w, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ls.astype(jnp.float32) + lb.astype(
            jnp.float32)
        u = xn.astype(jnp.bfloat16).astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(
            jnp.float32)
        return jax.nn.gelu(u, approximate=False)

    o = np.asarray(jax.jit(lambda *a: fc.dense_act_ln(*a))(x, ls, lb, w, b)).astype(np.float32)
    r = np.asarray(jax.jit(ref)(x, ls, lb, w, b))
    loss = lambda fn: (lambda *a: jnp.sum(jnp.sin(fn(*a).astype(jnp.float32))))
    g = jax.jit(jax.grad(loss(fc.dense_act_ln), argnums=(0, 3)))(x, ls, lb, w, b)
    gr = jax.jit(jax.grad(loss(ref), argnums=(0, 3)))(x, ls, lb, w, b)
    fe, _ = _rel(o, r)
    ok = fe < 0.02
    worst = 0.0
    for a, b2 in zip(g, gr):
        _, rel = _rel(a, b2)
        worst = max(worst, rel)
        ok = ok and rel < 0.02
    results.append(("dense_act_ln (LN+fc1+gelu)", fe, worst, ok))


def check_dense_ln(results):
    """Fused LN+dense (the norm1 -> qkv fold) fwd + dx/dw."""
    import jax
    import jax.numpy as jnp

    fc = importlib.import_module("distillclip_tpu.ops.fc1_act")

    rng = np.random.default_rng(2)
    rows, C, O = 512, 256, 768
    x = jnp.asarray(rng.normal(size=(rows, C)).astype(np.float32)).astype(jnp.bfloat16)
    ls = jnp.asarray(1 + 0.1 * rng.normal(size=(C,)).astype(np.float32)).astype(jnp.bfloat16)
    lb = jnp.asarray(0.1 * rng.normal(size=(C,)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(C, O)).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    b = jnp.asarray(0.1 * rng.normal(size=(O,)).astype(np.float32)).astype(jnp.bfloat16)

    def ref(x, ls, lb, w, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xn = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * ls.astype(jnp.float32) + lb.astype(
            jnp.float32)
        return xn.astype(jnp.bfloat16).astype(jnp.float32) @ w.astype(jnp.float32) + b.astype(
            jnp.float32)

    o = np.asarray(jax.jit(lambda *a: fc.dense_ln(*a))(x, ls, lb, w, b)).astype(np.float32)
    r = np.asarray(jax.jit(ref)(x, ls, lb, w, b))
    loss = lambda fn: (lambda *a: jnp.sum(jnp.sin(fn(*a).astype(jnp.float32))))
    g = jax.jit(jax.grad(loss(fc.dense_ln), argnums=(0, 3)))(x, ls, lb, w, b)
    gr = jax.jit(jax.grad(loss(ref), argnums=(0, 3)))(x, ls, lb, w, b)
    fe, _ = _rel(o, r)
    ok = fe < 0.02
    worst = 0.0
    for a, b2 in zip(g, gr):
        _, rel = _rel(a, b2)
        worst = max(worst, rel)
        ok = ok and rel < 0.02
    results.append(("dense_ln (LN+qkv)", fe, worst, ok))


def check_factored(results):
    """Opt-in factored transform kernel (DISTILLCLIP_TF_IMPL=factored):
    fwd + all three grads, across its selectable scores/mix modes.

    Round 5: its round-4-flagged scratch-reuse WAR hazard got per-iteration
    regions (the packed-rows fix pattern); this check is the hardware
    evidence the fix holds — every SELECTABLE kernel is now oracled, not
    just defaults (VERDICT r4 weak #1).
    """
    import os

    import jax
    import jax.numpy as jnp

    tf = importlib.import_module("distillclip_tpu.ops.transform_factored")

    def ref(qkv, wl, ww, B, N, H, d):
        HD = H * d
        x = qkv.astype(jnp.float32).reshape(B, N, 3, H, d).transpose(2, 0, 3, 1, 4)
        q, k, v = x[0], x[1], x[2]
        s = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(d)
        s = jnp.einsum("hg,bgij->bhij", wl.astype(jnp.float32), s)
        p = jax.nn.softmax(s, axis=-1)
        p = jnp.einsum("hg,bgij->bhij", ww.astype(jnp.float32), p)
        o = jnp.einsum("bhij,bhjd->bhid", p, v)
        return o.transpose(0, 2, 1, 3).reshape(B * N, HD)

    cases = [
        # (H, d, N, B, scores_mode, mix_mode, tag)
        (24, 32, 64, 8, "perhead", "fma", "image/default"),
        (12, 64, 80, 8, "perhead", "fma", "text/default"),
        (12, 64, 80, 8, "scaled", "fma", "text/scaled"),
        (12, 64, 80, 8, "perhead", "roll", "text/roll"),
    ]
    saved = {k: os.environ.get(k) for k in
             ("DISTILLCLIP_TF_SCORES", "DISTILLCLIP_TF_MIX")}
    try:
        for H, d, N, B, scores, mix, tag in cases:
            os.environ["DISTILLCLIP_TF_SCORES"] = scores
            os.environ["DISTILLCLIP_TF_MIX"] = mix
            HD = H * d
            rng = np.random.default_rng(0)
            qkv = jnp.asarray(
                rng.normal(size=(B * N, 3 * HD)).astype(np.float32) * 0.3
            ).astype(jnp.bfloat16)
            wl = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
            ww = jnp.asarray(rng.normal(size=(H, H)).astype(np.float32) * 0.2)
            kern = lambda x, l, w: tf.tf_factored_qkv(
                x, l, w, 1.0 / np.sqrt(d), N, H, N)
            refc = lambda x, l, w: ref(x, l, w, B, N, H, d)
            o = np.asarray(jax.jit(kern)(qkv, wl, ww)).astype(np.float32)
            r = np.asarray(jax.jit(refc)(qkv, wl, ww))
            loss = lambda fn: (lambda x, l, w: jnp.sum(
                jnp.sin(fn(x, l, w).astype(jnp.float32))))
            g = jax.jit(jax.grad(loss(kern), argnums=(0, 1, 2)))(qkv, wl, ww)
            gr = jax.jit(jax.grad(loss(refc), argnums=(0, 1, 2)))(qkv, wl, ww)
            fe, _ = _rel(o, r)
            ok = fe < 0.02
            worst = 0.0
            for a, b in zip(g, gr):
                _, rel = _rel(a, b)
                worst = max(worst, rel)
                ok = ok and rel < 0.02
            results.append((f"factored {tag} H={H} d={d}", fe, worst, ok))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


CHECKS = {"plain": check_plain, "transform": check_transform, "fc1": check_fc1,
          "dense_ln": check_dense_ln, "factored": check_factored}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=sorted(CHECKS), default=None)
    args = ap.parse_args(argv)
    _setup()
    import jax

    print(f"backend: {jax.devices()[0].platform}", file=sys.stderr)
    results = []
    for name, fn in CHECKS.items():
        if args.only and name != args.only:
            continue
        fn(results)
    fail = False
    for name, fwd_err, grad_err, ok in results:
        print(f"{'OK ' if ok else 'FAIL'} {name}: fwd_max_err={fwd_err:.4f} "
              f"grad_err={grad_err:.4f}")
        fail = fail or not ok
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
