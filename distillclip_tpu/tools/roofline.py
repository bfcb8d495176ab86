"""Component-level roofline for the distill train steps (VERDICT r2 item 2).

Analytic true-FLOP / HBM-byte model per op family for the shipped stage
configs, printed against the chip's peaks and (optionally) against a
measured device trace digest, so each component's gap to its own ceiling
is visible:

    python -m distillclip_tpu.tools.roofline --stage text --batch 1024 \
        [--trace /tmp/tr_dir] [--step-ms 138.4]

Families mirror tools/trace_summary.py buckets: the tower denses (qkv,
proj, fc1, fc2 with fwd + dX + dW), transform attention (both the colcat
H-inflated FLOPs the kernel actually issues and the true factorized
FLOPs), LayerNorm (bandwidth-bound), embeddings/head, loss, optimizer.

The model is the flagship RepeatTextTransformer / RepeatVisionTransformer
pair from configs/final (reference text.yaml / distillation_*.yaml); dims
are overridable via flags for other geometries.
"""

from __future__ import annotations

import argparse
import dataclasses
import json

# v5e single-chip peaks (the bench target in BASELINE.md)
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


@dataclasses.dataclass
class Component:
    name: str
    gflops: float          # true FLOPs the math needs, per step
    gbytes: float          # unavoidable HBM traffic, per step
    issued_gflops: float = None  # FLOPs actually issued (e.g. colcat inflation)

    @property
    def min_ms(self) -> float:
        """Speed-of-light time: max(compute, bandwidth) at chip peaks."""
        c = (self.issued_gflops or self.gflops) / PEAK_BF16_TFLOPS
        b = self.gbytes / PEAK_HBM_GBS
        return max(c, b)


def text_components(B: int, depth=4, repeats=2, N=77, Np=80, h=12, d=64,
                    vocab=49408, out_dim=512) -> list:
    """Stage-2 cached-teacher text step (configs/final/text.yaml shapes).

    Per effective layer (depth x repeats applications but weight-shared
    dW over `depth` unique layers), per sample, fwd dense FLOPs =
    2*N*Cin*Cout; backward = 2x (dX + dW).  LN and residuals are
    bandwidth-bound.
    """
    C = h * d
    # `depth` LOGICAL layers total: depth/repeats unique param blocks each
    # applied `repeats` times (models/repeat_vit.py docstring) — so the
    # per-step application count is exactly `depth`
    L = depth
    rows = B * Np
    GF = 1e9

    def dense(cin, cout, n_apps, name, bwd=True):
        f = 2 * rows * cin * cout * n_apps
        mult = 3 if bwd else 1   # fwd + dX + dW
        # bytes: act read + out write per app (+ same again for bwd passes)
        by = (rows * (cin + cout) * 2) * n_apps * (2 if bwd else 1)
        return Component(name, f * mult / GF, by / 1e9)

    comps = [
        dense(C, 3 * C, L, "qkv projection"),
        dense(C, C, L, "attn out proj"),
        dense(C, 4 * C, L, "mlp fc1 (+gelu)"),
        dense(4 * C, C, L, "mlp fc2"),
    ]
    # transform attention: true factorized FLOPs vs colcat-issued FLOPs
    HN = h * Np
    true_attn = 2 * B * (
        # fwd: per-head scores + outputs; bwd: dPm, dv, dq, dk (+S recompute)
        (2 + 5) * h * Np * Np * d
        # head mixes fwd (2) + bwd (2 unmix + dwl/dww reduces ~2)
        + 6 * h * h * Np * Np
    ) * L
    colcat_issued = 2 * B * (2 + 4) * Np * HN * C * L  # 2 fwd + 4 bwd matmuls (H-inflated)
    comps.append(Component(
        "transform attention (colcat-issued vs true)",
        true_attn / GF,
        # P' save + reload + qkv/do reads
        (B * HN * Np * 2 * 2 + rows * 4 * C * 2 * 2) * L / 1e9,  # P' save+load, qkv/do
        issued_gflops=colcat_issued / GF,
    ))
    # LayerNorm: 2 per layer app + final; bandwidth bound (bf16 in/out)
    ln_apps = 2 * L + 1
    comps.append(Component(
        "layernorm (fwd+bwd)",
        4 * rows * C * ln_apps / GF,           # ~4 flops/elem
        2 * (rows * C * 2 * 2) * ln_apps / 1e9,  # rd+wr, fwd+bwd
    ))
    # embedding gather + positional add; head projection to out_dim
    comps.append(Component("embed + eot head",
                           (2 * B * C * out_dim * 3) / GF,
                           (rows * C * 2 * 2 + B * out_dim * 4) / 1e9))
    # losses on [B, out_dim] reps + running stats: negligible flops
    comps.append(Component("losses", 2 * B * out_dim * 10 / GF,
                           B * out_dim * 4 * 6 / 1e9))
    # optimizer: adam on ~38M params fp32 masters (m, v, p rd+wr) + bf16 cast
    n_params = (C * 3 * C + C * C + C * 4 * C * 2) * depth + vocab * C + C * out_dim
    comps.append(Component("adamw + casts", 10 * n_params / GF,
                           n_params * 4 * 6 / 1e9))
    return comps


def image_components(B: int, depth=6, repeats=2, N=50, Np=64, h=24, d=32):
    """Stage-1/3 image-student tower (weight-share ViT, final configs)."""
    return text_components(B, depth=depth, repeats=repeats, N=N, Np=Np, h=h,
                           d=d, vocab=0, out_dim=512)


def joint_components(B: int) -> list:
    """Stage-3 joint step (configs/final/l_clip.yaml): live image student
    (depth 6, h=24, N=50->64) + text student (depth 4, h=12, N=77->80) +
    LIVE frozen image teacher (ViT-B/32: 12 plain layers, fwd only —
    augmented inputs cannot be cached) + cached text-teacher reps."""
    comps = []
    for c in image_components(B):
        c.name = "img-stu " + c.name
        comps.append(c)
    for c in text_components(B, out_dim=512):
        c.name = "txt-stu " + c.name
        comps.append(c)
    # teacher ViT-B/32 image tower, fwd only: 12 layers, C=768, h=12, N=50
    rows_t = B * 50
    GF = 1e9
    tC = 768
    t_dense = 2 * rows_t * (tC * 3 * tC + tC * tC + 2 * tC * 4 * tC) * 12
    t_attn = 2 * B * 2 * 12 * 50 * 50 * 64 * 12
    comps.append(Component("img-teacher fwd (12L, no bwd)",
                           (t_dense + t_attn) / GF,
                           rows_t * tC * 2 * 4 * 12 / 1e9))
    # patchify embeds (32x32x3 -> 768 matmul) student+teacher
    comps.append(Component("patchify embeds",
                           2 * B * 49 * 3072 * 768 * 2 * 2 / GF,
                           B * 224 * 224 * 3 * 2 / 1e9))
    return comps


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["text", "image", "joint"], default="text")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured full-step ms to show share columns")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    comps = {"text": text_components, "image": image_components,
             "joint": joint_components}[args.stage](args.batch)
    total_gf = sum(c.gflops for c in comps)
    total_issued = sum((c.issued_gflops or c.gflops) for c in comps)
    floor_ms = sum(c.min_ms for c in comps)

    if args.json:
        print(json.dumps({
            "stage": args.stage, "batch": args.batch,
            "true_gflops": round(total_gf, 1),
            "issued_gflops": round(total_issued, 1),
            "floor_ms": round(floor_ms, 2),
            "components": [
                {"name": c.name, "gflops": round(c.gflops, 1),
                 "issued_gflops": round(c.issued_gflops or c.gflops, 1),
                 "gbytes": round(c.gbytes, 2), "min_ms": round(c.min_ms, 3)}
                for c in comps
            ],
        }))
        return

    print(f"stage={args.stage} batch={args.batch}  "
          f"(peaks: {PEAK_BF16_TFLOPS} TF/s bf16, {PEAK_HBM_GBS} GB/s)")
    hdr = f"{'component':44s} {'true GF':>9s} {'issued GF':>10s} {'GB':>6s} {'min ms':>7s}"
    print(hdr)
    print("-" * len(hdr))
    for c in comps:
        print(f"{c.name:44s} {c.gflops:9.1f} {(c.issued_gflops or c.gflops):10.1f} "
              f"{c.gbytes:6.2f} {c.min_ms:7.3f}")
    print("-" * len(hdr))
    print(f"{'TOTAL (serial-floor)':44s} {total_gf:9.1f} {total_issued:10.1f} "
          f"{'':6s} {floor_ms:7.3f}")
    if args.step_ms:
        print(f"measured step: {args.step_ms:.1f} ms -> "
              f"{args.step_ms / floor_ms:.2f}x the component floor")


if __name__ == "__main__":
    main()
