#!/usr/bin/env python
"""Benchmark: L-CLIP distillation throughput (image-text pairs/sec/chip).

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "detail": {...}}

The headline workload is the stage-3 joint L-CLIP train step at the shipped
final scale (configs/final/l_clip.yaml): weight-share ViT student (depth 6,
repeated x2, embed 768, heads 24, patch 32) + weight-share text student
(depth 4, repeated x2) distilling a ViT-B/32-architecture CLIP teacher with
out_l1 + out_cos + cos_diff losses — forward(student+teacher) + backward +
AdamW per step.  The headline runs with the frozen TEXT teacher's reps
cached (captions are fixed token tensors, so its outputs are per-sample
constants; identical losses/updates — the recommended configuration for
no-tap loss configs, and the live number is reported alongside).  Teacher
weights are fabricated (zero-egress environment); identical architecture
means identical arithmetic cost.

The default run also measures the per-stage workloads (stage-1 image,
stage-2 text live + cached-teacher, stage-3 cached-text-teacher) with fewer
steps and reports them under detail.stages, so every stage's progress is
driver-visible (VERDICT r1 item 10).

Baseline: the reference publishes no numbers (BASELINE.md); the denominator
is the driver-set north star of 8,000 pairs/sec/chip.

    python bench.py                  # headline + per-stage detail (TPU)
    python bench.py --primary-only   # headline only
    python bench.py --stage text --cached-teacher   # one stage
    python bench.py --quick          # tiny scale (CPU sanity)
"""

import argparse
import json
import os
import subprocess
import sys
import time


NORTH_STAR_PAIRS_PER_SEC = 8000.0

# committed machine-readable record of successful hardware bench runs; the
# newest entry doubles as the "last good" fallback when the axon tunnel is
# down at bench time (VERDICT r3 item 1)
HISTORY_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH_HISTORY.jsonl")


def _history_path():
    return os.environ.get("DISTILLCLIP_BENCH_HISTORY", HISTORY_PATH)


def probe_backend(timeout_s):
    """One subprocess probe: True iff a fenced matmul completes in time.

    The probe must live in a subprocess: a wedged axon tunnel hangs INSIDE
    PJRT init holding the GIL (observed Aug 17), so no in-process thread
    can time it out.  DISTILLCLIP_BENCH_PROBE_CMD overrides the probe
    command (tests simulate outages with `false`).
    """
    cmd = os.environ.get("DISTILLCLIP_BENCH_PROBE_CMD")
    if cmd:
        argv = ["/bin/sh", "-c", cmd]
    else:
        argv = [sys.executable, "-c",
                "import numpy as np, jax, jax.numpy as jnp;"
                "x = jnp.ones((8, 8));"
                "np.asarray(x @ x)"]  # host readback = the only real fence
    try:
        subprocess.run(argv, timeout=timeout_s, check=True,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def wait_for_backend(probe_s, retry_s, interval_s=30.0, probe=None,
                     sleep=time.sleep, clock=time.monotonic):
    """Probe until the backend answers or the retry budget runs out.

    Tunnel outages are a known, recurring condition (BENCH_NOTES documents a
    4h+ one); a single-shot probe recorded round 3's throughput as 0.0
    (BENCH_r03.json).  Returns the number of probes made on success, 0 on
    exhaustion.  `probe`/`sleep`/`clock` are injectable for tests.
    """
    probe = probe or probe_backend
    deadline = clock() + retry_s
    attempts = 0
    while True:
        attempts += 1
        t0 = clock()
        if probe(probe_s):
            return attempts
        now = clock()
        print(f"bench: backend probe {attempts} failed "
              f"({now - t0:.0f}s); {max(0.0, deadline - now):.0f}s of retry "
              "budget left", file=sys.stderr)
        if now >= deadline:
            return 0
        sleep(min(interval_s, max(0.0, deadline - now)))


def last_good_history(path=None):
    """Newest history entry with a nonzero headline value, or None."""
    path = path or _history_path()
    try:
        with open(path) as f:
            lines = f.readlines()
    except OSError:
        return None
    for line in reversed(lines):
        line = line.strip()
        if not line:
            continue
        try:
            entry = json.loads(line)
        except ValueError:
            continue
        if entry.get("value", 0) > 0:
            return entry
    return None


def append_history(result, path=None):
    """Record a successful hardware run (timestamped + git-stamped)."""
    path = path or _history_path()
    entry = dict(result)
    entry["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S%z")
    try:
        entry["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        pass
    with open(path, "a") as f:
        f.write(json.dumps(entry) + "\n")


def _fabricated_vit_b32(path: str):
    """ViT-B/32-architecture CLIP checkpoint with random weights."""
    if os.path.exists(path):
        return path
    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict
    import torch

    sd = make_clip_state_dict(
        vision_width=768, vision_layers=12, patch_size=32, image_resolution=224,
        text_width=512, text_layers=12, context_length=77, vocab_size=49408,
        embed_dim=512,
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)
    return path


def _fabricated_teacher_quick(cache):
    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict
    import torch

    path = os.path.join(cache, "bench_tiny.pt")
    if not os.path.exists(path):
        os.makedirs(cache, exist_ok=True)
        torch.save(make_clip_state_dict(), path)
    return path


def run_stage(stage, quick=False, batch=None, steps=20, warmup=3,
              cached_teacher=False, all_cached=False, trace_dir=None):
    """Measure one stage's train step; returns a result dict."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distillclip_tpu.models import RepeatTextTransformer, RepeatVisionTransformer
    from distillclip_tpu.parallel import create_mesh, shard_batch
    from distillclip_tpu.training import DistillTask, DualDistillTask

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    if quick:
        teacher = _fabricated_teacher_quick(cache)
        img_size, patch, embed, depth, heads = 32, 8, 64, 2, 4
        txt_embed, txt_depth = 64, 2
        batch = batch or 16
        out_dim = 48
    else:
        teacher = _fabricated_vit_b32(os.path.join(cache, "bench_vit_b32.pt"))
        # final l_clip.yaml student scale
        img_size, patch, embed, depth, heads = 224, 32, 768, 6, 24
        txt_embed, txt_depth = 768, 4
        # image default 256: live-stage batch sweep (fenced, round 4) —
        # B=256 (true-N active) 4,486/4,551 img/s vs B=512 4,394/4,405 and
        # B=320 4,484; the reference's 1024-global/4-GPU config maps to 256
        # per chip anyway
        batch = batch or {"l_clip": 256, "image": 256, "text": 1024}[stage]
        out_dim = 512

    image_student = RepeatVisionTransformer(
        img_size=img_size, patch_size=patch, out_dim=out_dim, embed_dim=embed,
        depth=depth, num_heads=heads, repeated_times=2, qkv_bias=True,
        use_transform=True,
    )
    text_student = RepeatTextTransformer(
        vocab_size=49408, context_length=77, out_dim=out_dim, embed_dim=txt_embed,
        depth=txt_depth, num_heads=max(4, heads // 2), repeated_times=2,
        use_transform=True,
        # stage-2 final config trains the compression embedding
        # (reference config/final_config/text.yaml:10); stage-3 l_clip.yaml
        # leaves the full vocab table (reference defaults)
        compression_embedding=(stage == "text" and not quick),
    )
    mesh = create_mesh()
    n_chips = mesh.devices.size
    rng = jax.random.PRNGKey(0)
    global_batch = batch * n_chips

    # uint8 images: the production input path (native JPEG decode emits raw
    # uint8; prep_inputs normalizes on device, train_state.py:140-157).
    # Feeding f32 here cost a measured 0.35 ms/step of pure convert on the
    # joint trace (convert.541, round 3b) and understates the real pipeline.
    images = np.random.default_rng(0).integers(
        0, 256, size=(global_batch, img_size, img_size, 3)).astype(np.uint8)
    tokens = np.random.default_rng(1).integers(1, 49407, size=(global_batch, 77)).astype(np.int32)
    tokens[:, -1] = 49407

    if stage == "l_clip":
        task = DualDistillTask(
            image_student=image_student,
            text_student=text_student,
            loss_control_para={
                "loss_name": ["out_l1", "out_cos", "cos_diff"],
                "loss_scale": {"cos_diff": 0.1},
            },
            teacher_name=teacher,
            lr=1e-4, warm_steps=15, total_steps=300,
        )
        state, tx = task.init_state(rng, jnp.asarray(tokens[:1]), jnp.asarray(images[:1]), steps_per_epoch=100)
        b_images = shard_batch(mesh, jnp.asarray(images))
        b_tokens = shard_batch(mesh, jnp.asarray(tokens))
        tea_cv = task.teacher_compute_vars
        if all_cached:
            # FLOP lever (no-augment deviation, BASELINE.md north-star
            # analysis): BOTH frozen-teacher towers pre-encoded, the whole
            # teacher drops out of the step (DualDistillTask.cached_teachers)
            b_treps = shard_batch(mesh, task.make_teacher_text_encode(mesh)(b_tokens))
            b_ireps = shard_batch(mesh, task.make_teacher_image_encode(mesh)(b_images))
            step_fn = task.make_train_step(mesh, tx, cached_teachers=True)
            lower_args = (state, b_tokens, b_images, b_treps, b_ireps, rng)
        elif cached_teacher:
            b_reps = shard_batch(mesh, task.make_teacher_text_encode(mesh)(b_tokens))
            step_fn = task.make_train_step(mesh, tx, cached_text_teacher=True)
            lower_args = (state, tea_cv, b_tokens, b_images, b_reps, rng)
        else:
            step_fn = task.make_train_step(mesh, tx)
            lower_args = (state, tea_cv, b_tokens, b_images, rng)
    else:
        task = DistillTask(
            student=image_student if stage == "image" else text_student,
            loss_control_para={"loss_name": ["out_l1", "out_cos"]},
            teacher_name=teacher,
            model_type=stage,
            lr=5e-3, warm_steps=10, total_steps=200,
        )
        inputs = images if stage == "image" else tokens
        state, tx = task.init_state(rng, jnp.asarray(inputs[:1]), steps_per_epoch=100)
        b_inputs = shard_batch(mesh, jnp.asarray(inputs))
        tea_cv = task.teacher_compute_vars
        if cached_teacher:
            b_reps = shard_batch(mesh, task.make_teacher_encode(mesh)(b_inputs))
            step_fn = task.make_train_step(mesh, tx, cached_teacher=True)
            lower_args = (state, b_reps, b_inputs, rng)
        else:
            step_fn = task.make_train_step(mesh, tx)
            lower_args = (state, tea_cv, b_inputs, rng)

    step = lambda st: step_fn(st, *lower_args[1:])

    def fence(m):
        # host readback is the only reliable completion fence on remote
        # (tunneled) backends where block_until_ready returns at dispatch
        return float(np.asarray(m["loss"]))

    for _ in range(warmup):
        state, metrics = step(state)
    fence(metrics)

    if trace_dir:
        # device trace of 3 steps (tools/trace_summary.py digests the
        # resulting perfetto trace.json.gz); traces DO work through the
        # axon tunnel (BENCH_NOTES round 2)
        with jax.profiler.trace(trace_dir):
            for _ in range(3):
                state, metrics = step(state)
            fence(metrics)

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state)
    fence(metrics)
    dt = time.perf_counter() - t0

    pairs_per_sec_per_chip = global_batch * steps / dt / n_chips

    # MFU estimate from XLA's own cost model (bf16 peak ~197 TF/s per v5e)
    mfu = step_flops = step_bytes = None
    try:
        c = step_fn.lower(*lower_args).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        step_flops = float(ca.get("flops", 0.0))
        step_bytes = float(ca.get("bytes accessed", 0.0))
        peak = 197e12 if jax.devices()[0].platform == "tpu" else None
        if peak and step_flops:
            mfu = step_flops / (dt / steps) / peak
    except Exception:
        pass

    return {
        "stage": stage,
        "cached_teacher": cached_teacher or all_cached,
        "all_cached": all_cached,
        "value": round(pairs_per_sec_per_chip, 2),
        "global_batch": global_batch,
        "chips": n_chips,
        "step_time_ms": round(dt / steps * 1000, 2),
        "backend": jax.devices()[0].platform,
        "quick": quick,
        "mfu": round(mfu, 4) if mfu else None,
        "step_gflops": round(step_flops / 1e9, 1) if step_flops else None,
        "step_gbytes": round(step_bytes / 1e9, 2) if step_bytes else None,
    }


def run_serve(quick=False, buckets=(256, 1024), iters=10, warmup=2):
    """Serving throughput: L-CLIPScore pairs scored/sec/chip per bucket.

    L-CLIPScore IS the product (reference Readme.md:1-2, clip_model.py:45-49
    only_last_rep fast path); this measures the student-tower scorer —
    encode image + encode caption tokens + cosine — at the static batch
    buckets the server pads to.  Host tokenization is excluded (it
    pipelines on the serving host; `score_tokens` is the device leg).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from distillclip_tpu.models import RepeatTextTransformer, RepeatVisionTransformer
    from distillclip_tpu.models.outputs import ControlFlags
    from distillclip_tpu.serving.lclip_score import LCLIPScorer

    if quick:
        img_size, patch, embed, depth, heads = 32, 8, 64, 2, 4
        txt_embed, txt_depth, out_dim = 64, 2, 48
        buckets = tuple(min(b, 64) for b in buckets)
    else:
        img_size, patch, embed, depth, heads = 224, 32, 768, 6, 24
        txt_embed, txt_depth, out_dim = 768, 4, 512

    image_student = RepeatVisionTransformer(
        img_size=img_size, patch_size=patch, out_dim=out_dim, embed_dim=embed,
        depth=depth, num_heads=heads, repeated_times=2, qkv_bias=True,
        use_transform=True,
    )
    text_student = RepeatTextTransformer(
        vocab_size=49408, context_length=77, out_dim=out_dim, embed_dim=txt_embed,
        depth=txt_depth, num_heads=max(4, heads // 2), repeated_times=2,
        use_transform=True,
    )
    rng = jax.random.PRNGKey(0)
    img_vars = jax.jit(image_student.init, static_argnums=(2,))(
        rng, jnp.zeros((1, img_size, img_size, 3), jnp.float32), ControlFlags()
    )
    txt_vars = jax.jit(text_student.init, static_argnums=(2,))(
        rng, jnp.zeros((1, 77), jnp.int32), ControlFlags()
    )
    scorer = LCLIPScorer(
        image_module=image_student, image_vars=img_vars,
        text_module=text_student, text_vars=txt_vars,
        tokenizer=None, image_size=img_size,
    )

    import jax.numpy as jnp

    out = {}
    for b in buckets:
        # uint8 requests: the production wire format (native JPEG decode
        # emits raw uint8; the scorer normalizes on device) — 4x less
        # host->device payload than fp32
        images = np.random.default_rng(0).integers(
            0, 256, size=(b, img_size, img_size, 3)).astype(np.uint8)
        tokens = np.random.default_rng(1).integers(1, 49407, size=(b, 77)).astype(np.int32)
        tokens[:, -1] = 49407
        for _ in range(warmup):
            scores = scorer.score_tokens(images, tokens)  # np readback = fence
        t0 = time.perf_counter()
        for _ in range(iters):
            scores = scorer.score_tokens(images, tokens)
        dt = time.perf_counter() - t0
        assert scores.shape == (b,)

        # device-resident leg: inputs already on device, ONE fused dispatch
        # + readback per call — the number a colocated serving host sees
        # (through the axon tunnel, e2e above is dominated by host->device
        # transfer of the request pixels, and even this leg carries one
        # network round trip of fixed latency per call)
        d_imgs, d_toks = jnp.asarray(images), jnp.asarray(tokens)
        s = np.asarray(scorer._score_pairs(
            scorer.image_vars, scorer.text_vars, d_imgs, d_toks))
        t0 = time.perf_counter()
        for _ in range(iters):
            s = np.asarray(scorer._score_pairs(
                scorer.image_vars, scorer.text_vars, d_imgs, d_toks))
        dt_dev = time.perf_counter() - t0
        assert s.shape == (b,)
        # streamed e2e: double-buffered host->device transfer overlapping
        # the fused scorer (LCLIPScorer.score_tokens_stream, VERDICT r4
        # item 7) — the code path a production serving host runs; compare
        # against the serial per-call e2e above
        stream_iters = max(iters, 4)
        batches = [(images, tokens)] * stream_iters
        for _ in scorer.score_tokens_stream(iter(batches[:2])):
            pass  # warm the pipeline
        t0 = time.perf_counter()
        n_done = 0
        for s in scorer.score_tokens_stream(iter(batches)):
            n_done += len(s)
        dt_stream = time.perf_counter() - t0
        assert n_done == b * stream_iters

        out[f"bucket_{b}"] = {
            "pairs_per_s_per_chip": round(b * iters / dt, 2),
            "latency_ms": round(dt / iters * 1000, 2),
            "streamed_pairs_per_s": round(b * stream_iters / dt_stream, 2),
            "device_resident_pairs_per_s": round(b * iters / dt_dev, 2),
            "device_resident_latency_ms": round(dt_dev / iters * 1000, 2),
        }

    # fixed per-call (dispatch/tunnel) latency cancels in the two-bucket
    # marginal: the compute-only throughput a colocated host approaches.
    # This is an EXTRAPOLATION (two-bucket subtraction), not a measured
    # colocated-host rate — the measured overlap path is
    # streamed_pairs_per_s above.
    keys = sorted(out, key=lambda k: int(k.split("_")[1]))
    if len(keys) >= 2:
        b0, b1 = int(keys[0].split("_")[1]), int(keys[-1].split("_")[1])
        t0_, t1_ = (out[keys[0]]["device_resident_latency_ms"],
                    out[keys[-1]]["device_resident_latency_ms"])
        if t1_ > t0_:
            out["marginal_pairs_per_s_extrapolated"] = round(
                (b1 - b0) / (t1_ - t0_) * 1000, 2)
    return out


METRIC_NAMES = {
    "l_clip": "image-text pairs/sec/chip (L-CLIP distill)",
    "image": "images/sec/chip (stage-1 distill)",
    "text": "captions/sec/chip (stage-2 distill)",
    "serve": "pairs scored/sec/chip (L-CLIPScore serving)",
}

# per-stage sub-benches reported under detail.stages on the default run;
# fewer steps than the headline — they reuse the same compile cache
EXTRA_STAGES = (
    ("l_clip_live", dict(stage="l_clip")),
    ("l_clip_allcached", dict(stage="l_clip", all_cached=True)),
    ("text", dict(stage="text")),
    ("text_cached", dict(stage="text", cached_teacher=True)),
    ("image", dict(stage="image")),
    # stage-1 FLOP lever (no-augment deviation,
    # configs/final/image_allcached.yaml): teacher dropped from the step
    ("image_cached", dict(stage="image", cached_teacher=True)),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true", help="tiny CPU sanity run")
    parser.add_argument("--batch", type=int, default=None, help="per-chip batch size")
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--warmup", type=int, default=3)
    parser.add_argument("--stage", choices=["l_clip", "image", "text"], default=None,
                        help="measure ONE stage (default: headline l_clip + "
                             "per-stage sub-benches in detail.stages)")
    parser.add_argument("--serve", action="store_true",
                        help="measure ONLY the L-CLIPScore serving path "
                             "(student scorer, buckets 256/1024)")
    parser.add_argument("--primary-only", action="store_true",
                        help="skip the per-stage sub-benches")
    parser.add_argument(
        "--cached-teacher", action="store_true",
        help="precompute frozen-teacher reps and drop that tower from the "
             "step (text: fixed token tensors; image: the no-augment "
             "deviation — fixed pixels, configs/final/image_allcached.yaml; "
             "l_clip: the text tower)",
    )
    parser.add_argument("--trace", default=None, metavar="DIR",
                        help="write a 3-step jax.profiler device trace to DIR "
                             "(digest with tools/trace_summary.py)")
    args = parser.parse_args()

    if args.quick:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    if not args.quick:
        # Backend watchdog with a bounded RETRY loop: the axon tunnel can
        # wedge (connects but never answers), and outages lasting hours are
        # a known recurring condition — a one-shot probe recorded round 3's
        # official throughput as 0.0 (BENCH_r03.json).  Keep probing for up
        # to DISTILLCLIP_BENCH_RETRY_S before giving up, and on final
        # failure surface the newest committed measurement from
        # BENCH_HISTORY.jsonl in detail (marked stale; value stays 0.0 so
        # the driver can't mistake it for a fresh number).
        probe_s = float(os.environ.get("DISTILLCLIP_BENCH_PROBE_S", "120"))
        retry_s = float(os.environ.get("DISTILLCLIP_BENCH_RETRY_S", "1800"))
        attempts = wait_for_backend(probe_s, retry_s)
        if not attempts:
            detail = {
                "error": f"backend unreachable after {retry_s:.0f}s retry "
                         "budget (per-probe timeout "
                         f"{probe_s:.0f}s)",
                "stale": True,
            }
            last = last_good_history()
            if last is not None:
                detail["last_good"] = last
            print(json.dumps({
                "metric": METRIC_NAMES.get("l_clip", "pairs/s/chip"),
                "value": 0.0,
                "unit": "pairs/s/chip",
                "vs_baseline": 0.0,
                "detail": detail,
            }))
            sys.exit(2)

    import jax

    from distillclip_tpu.runtime import setup_cache

    setup_cache()
    if args.quick:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    if args.serve:
        serving = run_serve(quick=args.quick)
        headline = max(
            v["pairs_per_s_per_chip"] for v in serving.values()
            if isinstance(v, dict) and "pairs_per_s_per_chip" in v
        )
        print(json.dumps({
            "metric": METRIC_NAMES["serve"],
            "value": headline,
            "unit": "pairs/s/chip",
            "vs_baseline": round(headline / NORTH_STAR_PAIRS_PER_SEC, 4),
            "detail": {"serving": serving, "quick": args.quick},
        }))
        return

    primary_stage = args.stage or "l_clip"
    # Headline default: stage-3 with the frozen text teacher's reps cached —
    # the recommended way to run the shipped no-tap loss config (identical
    # losses/updates; the teacher text tower's outputs are constants for
    # fixed caption tokens).  The live-teacher number stays in
    # detail.stages.l_clip_live; tap-dependent loss configs require the
    # live path (--stage l_clip without --cached-teacher measures it).
    cached = args.cached_teacher or args.stage is None
    res = run_stage(primary_stage, quick=args.quick, batch=args.batch,
                    steps=args.steps, warmup=args.warmup,
                    cached_teacher=cached, trace_dir=args.trace)

    detail = dict(res)
    value = detail.pop("value")

    if args.stage is None and not args.primary_only:
        stages = {}
        for name, kw in EXTRA_STAGES:
            try:
                r = run_stage(quick=args.quick, steps=max(5, args.steps // 2),
                              warmup=2, **kw)
                stages[name] = {
                    "value": r["value"],
                    "global_batch": r["global_batch"],
                    "step_time_ms": r["step_time_ms"],
                    "cached_teacher": r["cached_teacher"],
                }
            except Exception as e:  # sub-benches must never sink the headline
                stages[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        detail["stages"] = stages
        # machine-readable feasibility verdict (VERDICT r4 item 6): the
        # headline's vs_baseline must self-explain — the joint stage as the
        # reference configures it is FLOP-bound BELOW the target on one
        # chip, while the per-stage targets that are arithmetically
        # reachable are met.  Full analysis: BASELINE.md.
        sv = lambda n: stages.get(n, {}).get("value")
        deviations = [
            (name, sv(name))
            for name in ("l_clip_allcached", "image_cached")
            if sv(name) is not None
        ]
        # never present an errored stage as the best deviation: with no
        # measured deviation the field says so explicitly
        best_dev = max(deviations, key=lambda kv: kv[1]) if deviations else (
            None, None)
        detail["north_star"] = {
            "target_pairs_per_s": NORTH_STAR_PAIRS_PER_SEC,
            "met_stages": {
                name: s["value"] >= NORTH_STAR_PAIRS_PER_SEC
                for name, s in stages.items() if "value" in s
            },
            # true-FLOP ceiling of the headline config (cached-text joint
            # step, B=256) at 100% MFU on one v5e: ~62 ms issued-FLOP
            # serial floor -> ~4,900 pairs/s (BENCH_NOTES round-3 roofline);
            # no schedule can cross it — only removing FLOPs can
            "joint_flop_ceiling_pairs_per_s": 4900,
            "headline_is_flop_bound": True,
            # fastest documented-deviation config (FLOP removal via
            # no-augment cached teachers)
            "best_deviation": {"config": best_dev[0], "value": best_dev[1]},
            "analysis": "BASELINE.md: North-star feasibility",
        }
        try:  # serving numbers ride along in the default run (VERDICT r2 #6)
            detail["serving"] = run_serve(quick=args.quick)
        except Exception as e:
            detail["serving"] = {"error": f"{type(e).__name__}: {e}"[:200]}
        try:
            # host input pipeline (BASELINE.md metric list; VERDICT r4
            # item 5): native decode+RandAugment img/s per thread +
            # tokenizer capt/s on the fabricated-JPEG corpus (host-side,
            # backend-independent)
            from distillclip_tpu.tools.input_bench import run as input_run

            detail["input_pipeline"] = input_run(
                n=128 if args.quick else 256,
                threads_list=(1, 2),
                image_size=64 if args.quick else 224,
                n_captions=2000 if args.quick else 10000,
            )
        except Exception as e:
            detail["input_pipeline"] = {"error": f"{type(e).__name__}: {e}"[:200]}

    result = {
        "metric": METRIC_NAMES[primary_stage],
        "value": value,
        "unit": "pairs/s/chip",
        "vs_baseline": round(value / NORTH_STAR_PAIRS_PER_SEC, 4),
        "detail": detail,
    }
    print(json.dumps(result))
    if not args.quick and value > 0:
        try:
            append_history(result)
        except Exception as e:  # history is best-effort, never sinks a run
            print(f"bench: history append failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
