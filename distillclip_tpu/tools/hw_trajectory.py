"""Multi-step hardware training-trajectory agreement (TPU vs CPU).

The round-4 packed-rows WAR hazard (BENCH_NOTES "Round-4 correctness
find") was invisible to single-step checks and to interpret mode: it
needed gb >= 2 shapes, a causal tower, and showed up as silently-wrong
TRAINING on hardware while CPU stayed correct.  The regression class is
therefore "hardware training diverges from CPU training" — this tool runs
the SAME seeded trajectory (same fabricated teacher, same init, same
fixed batches; the reference's hot loop is distil_model.py:97) for N
steps on two backends and asserts the loss curves agree:

    python -m distillclip_tpu.tools.hw_trajectory            # all legs
    python -m distillclip_tpu.tools.hw_trajectory --platform cpu --dump c.json
    python -m distillclip_tpu.tools.hw_trajectory --compare dev.json c.json shadow.json

The workload is deliberately WAR-relevant: live causal CLIP text teacher
(the tower the round-4 bug corrupted), per-layer tap losses
(attention_score_mse + hidden_rep_mse force the instrumented path), batch
large enough that every row-blocked kernel runs gb >= 2, default kernels
ON, and a REAL learning rate so updates compound (11x loss decrease over
the 50 steps).  bf16 matmul accumulation differs between the MXU and the
CPU emulation and the Adam trajectory amplifies that chaotically, so the
verdict is a three-check SELF-CALIBRATING envelope (see ``compare()``):
a tight pre-compounding early window (catches wrong math at step 0), a
shadow envelope calibrated by a perturbed CPU leg (bounds late drift by
the trajectory's own measured chaos rate), and endpoint agreement.

Run it (like tools/hw_oracle.py) after any kernel or step-function
change, before trusting a hardware training run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

# defaults chosen so the CPU (interpret-kernel) leg stays tractable while
# keeping gb >= 2 everywhere and a multiple of 8 rows per block
STEPS = 50
BATCH = 16


def run_trajectory(steps: int = STEPS, batch: int = BATCH, seed: int = 2022,
                   perturb: float = 0.0):
    """One seeded text-distill trajectory; returns per-step losses.

    ``perturb`` multiplies every init parameter by (1 + perturb * n) with
    seeded unit normals n — the shadow leg that MEASURES how fast this
    (chaotic, Adam-driven) trajectory amplifies bf16-scale differences,
    calibrating the agreement envelope (see compare())."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from distillclip_tpu.models import RepeatTextTransformer
    from distillclip_tpu.parallel import create_mesh, shard_batch
    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict
    from distillclip_tpu.training import DistillTask

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".cache")
    os.makedirs(cache, exist_ok=True)
    teacher = os.path.join(cache, "traj_clip.pt")
    if not os.path.exists(teacher):
        torch.save(make_clip_state_dict(), teacher)

    task = DistillTask(
        student=RepeatTextTransformer(
            vocab_size=49408, context_length=77, out_dim=48, embed_dim=64,
            depth=2, num_heads=4, repeated_times=2, use_transform=True,
        ),
        # taps force the live (causal) teacher text tower + instrumented
        # attention — the exact surface the round-4 hazard corrupted
        loss_control_para={
            "loss_name": ["out_l1", "attention_score_mse", "hidden_rep_mse"],
        },
        teacher_name=teacher, download_root=cache, model_type="text",
        teacher_need_layers=[0, 1],
        # warm_steps=0: the schedule steps PER EPOCH and the whole
        # trajectory is one epoch at steps_per_epoch=5 -> ~10 "epochs" of
        # real cosine lr.  A warmup would pin epoch-0 lr to 0 and the
        # trajectory would never update params — agreement must compare
        # COMPOUNDING updates, not 50 evaluations of the init
        lr=3e-3, warm_steps=0, total_steps=10,
    )
    mesh = create_mesh()
    rng = jax.random.PRNGKey(seed)
    data_rng = np.random.default_rng(seed)
    tokens = data_rng.integers(1, 49407, size=(steps, batch, 77)).astype(np.int32)
    tokens[:, :, 0] = 49406
    tokens[:, :, -1] = 49407

    state, tx = task.init_state(rng, jnp.asarray(tokens[0, :1]), steps_per_epoch=5)
    if perturb:
        leaves, treedef = jax.tree_util.tree_flatten(state.params)
        prng = np.random.default_rng(seed + 7)
        leaves = [
            np.asarray(x) * (1.0 + perturb * prng.standard_normal(np.shape(x)))
            for x in leaves
        ]
        params = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x, jnp.float32) for x in leaves])
        state = state.replace(params=params, opt_state=tx.init(params))
    step_fn = task.make_train_step(mesh, tx)
    tea_cv = task.teacher_compute_vars

    losses = []
    for i in range(steps):
        batch_i = shard_batch(mesh, jnp.asarray(tokens[i]))
        state, metrics = step_fn(state, tea_cv, batch_i, rng)
        # per-step host readback: the fence is the point here (we want the
        # actual computed trajectory, not a dispatch pipeline)
        losses.append(float(np.asarray(metrics["loss"])))
    return losses


def _rel_curve(a, b):
    if len(a) != len(b):
        raise ValueError(f"curve lengths differ: {len(a)} vs {len(b)}")
    return [abs(x - y) / max(abs(x), abs(y), 1e-9) for x, y in zip(a, b)]


def compare(dev, cpu, shadow=None, early_tol: float = 0.01,
            early_steps: int = 3, margin: float = 4.0, floor: float = 0.02):
    """Trajectory-agreement verdict with a self-calibrating envelope.

    An Adam trajectory is chaotic: any bf16-scale difference (MXU vs
    CPU-emulated accumulation order) AMPLIFIES step over step, so a fixed
    per-step tolerance either flakes late or is too loose early.  Three
    checks instead:

    1. EARLY WINDOW (pre-compounding): the first ``early_steps`` losses
       must agree within ``early_tol`` — wrong forward/backward math shows
       up immediately (the round-4 WAR hazard corrupted step-0 outputs at
       O(1) relative error), while accumulation drift has not compounded
       yet.
    2. SHADOW ENVELOPE: the CPU leg re-run with a 1e-3 init perturbation
       measures how fast THIS trajectory amplifies small differences; the
       device-vs-CPU divergence must stay within ``margin`` x the shadow
       divergence (cumulative max, per step), floored at ``floor``.
    3. ENDPOINT: final losses within ``floor`` x margin relative — both
       runs must land in the same basin.
    """
    rel_dc = _rel_curve(dev, cpu)
    early = max(rel_dc[:early_steps])
    checks = {"early_max_rel": early, "early_ok": early <= early_tol}
    if shadow is not None:
        rel_sh = _rel_curve(cpu, shadow)
        cum_dev, cum_sh = 0.0, 0.0
        envelope_ok = True
        worst_ratio_step = 0
        for i, (rd, rs) in enumerate(zip(rel_dc, rel_sh)):
            cum_dev = max(cum_dev, rd)
            cum_sh = max(cum_sh, rs)
            allowed = max(floor, margin * cum_sh)
            if cum_dev > allowed:
                envelope_ok = False
                worst_ratio_step = i
                break
        checks.update({
            "envelope_ok": envelope_ok,
            "max_rel_dev_vs_cpu": max(rel_dc),
            "max_rel_cpu_vs_shadow": max(rel_sh),
            "envelope_broken_at": None if envelope_ok else worst_ratio_step,
        })
    final_rel = rel_dc[-1]
    checks["final_rel"] = final_rel
    checks["final_ok"] = final_rel <= margin * floor
    ok = checks["early_ok"] and checks["final_ok"] and checks.get(
        "envelope_ok", True)
    return {"ok": ok, "steps": len(dev), **{
        k: (round(v, 6) if isinstance(v, float) else v)
        for k, v in checks.items()
    }}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=STEPS)
    ap.add_argument("--batch", type=int, default=BATCH)
    ap.add_argument("--seed", type=int, default=2022)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (cpu) for this leg")
    ap.add_argument("--perturb", type=float, default=0.0,
                    help="init-param relative perturbation (shadow leg)")
    ap.add_argument("--dump", default=None, metavar="PATH",
                    help="write this leg's losses to PATH and exit")
    ap.add_argument("--compare", nargs="+", default=None,
                    metavar="CURVE",
                    help="compare dumped curves (dev cpu [shadow]) instead "
                         "of running")
    args = ap.parse_args(argv)

    if args.compare:
        curves = []
        for path in args.compare:
            with open(path) as f:
                curves.append(json.load(f)["losses"])
        verdict = compare(curves[0], curves[1],
                          curves[2] if len(curves) > 2 else None)
        print(json.dumps(verdict))
        return 0 if verdict["ok"] else 1

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from distillclip_tpu.runtime import setup_cache

    setup_cache()

    if args.dump:
        losses = run_trajectory(args.steps, args.batch, args.seed,
                                args.perturb)
        with open(args.dump, "w") as f:
            json.dump({"backend": jax.devices()[0].platform,
                       "perturb": args.perturb, "losses": losses}, f)
        print(f"{jax.devices()[0].platform} (perturb={args.perturb}): "
              f"{args.steps} steps, loss {losses[0]:.4f} -> "
              f"{losses[-1]:.4f}", file=sys.stderr)
        return 0

    # default: run the device leg in-process, the CPU leg + its perturbed
    # shadow in subprocesses (the platform must be fixed before any
    # backend touch, and this process is about to use the default backend)
    losses_dev = run_trajectory(args.steps, args.batch, args.seed)
    dev = jax.devices()[0].platform
    print(f"{dev}: loss {losses_dev[0]:.4f} -> {losses_dev[-1]:.4f}",
          file=sys.stderr)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    curves = {}
    for name, perturb in (("cpu", 0.0), ("shadow", 1e-3)):
        dump = os.path.join(".cache", f"traj_{name}.json")
        r = subprocess.run(
            [sys.executable, "-m", "distillclip_tpu.tools.hw_trajectory",
             "--platform", "cpu", "--dump", dump,
             "--steps", str(args.steps), "--batch", str(args.batch),
             "--seed", str(args.seed), "--perturb", str(perturb)],
            cwd=repo,
        )
        if r.returncode:
            print(f"{name} leg failed", file=sys.stderr)
            return 2
        with open(os.path.join(repo, dump)) as f:
            curves[name] = json.load(f)["losses"]
    verdict = compare(losses_dev, curves["cpu"], curves["shadow"])
    verdict["backend"] = dev
    verdict["loss_first_last"] = [losses_dev[0], losses_dev[-1]]
    print(json.dumps(verdict))
    return 0 if verdict["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
