"""Digest a jax.profiler device trace into a per-op-family cost table.

Usage:
    python bench.py --stage text --cached-teacher --trace /tmp/tr
    python -m distillclip_tpu.tools.trace_summary /tmp/tr [--top 25] [--steps 3]

Parses the perfetto ``*.trace.json.gz`` that ``jax.profiler.trace`` writes
(works through the axon tunnel — BENCH_NOTES round 2), keeps the TPU/device
track events, and groups durations by a normalized op family so repeated
``fusion.N`` / ``loop_*_fusion.N`` instances aggregate.  Durations are
reported per traced step (``--steps``, default 3 to match bench.py --trace).

This is the measurement loop behind the round-2/3 layout findings: the
"63% transposed denses + 25% relayouts" diagnosis and the 2D-rows-mode fix
were both read off this table.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def _find_trace_file(root: str) -> str:
    cands = glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True)
    if not cands:
        raise FileNotFoundError(f"no *.trace.json.gz under {root}")
    return max(cands, key=os.path.getmtime)


_NUM_SUFFIX = re.compile(r"[._-]\d+$")
_DOT_NUM = re.compile(r"\.\d+")


def _family(name: str) -> str:
    """Normalize an HLO op name to its family (fusion.123 -> fusion)."""
    base = name.split("/")[-1]
    base = _NUM_SUFFIX.sub("", base)
    base = _DOT_NUM.sub("", base)
    return base


def _device_pids(meta_events) -> set:
    """Process ids whose name looks like a device (TPU/accelerator) track."""
    pids = set()
    for ev in meta_events:
        if ev.get("name") == "process_name":
            pname = (ev.get("args") or {}).get("name", "")
            if any(k in pname for k in ("TPU", "/device:", "Device", "XLA Op")):
                pids.add(ev["pid"])
    return pids


def summarize(trace_root: str, top: int = 25, steps: int = 3, ops: int = 0):
    path = _find_trace_file(trace_root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    meta = [e for e in events if e.get("ph") == "M"]
    dev_pids = _device_pids(meta)

    # thread names let us drop host-side threads that live under a device pid
    thread_names = {}
    for ev in meta:
        if ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = (ev.get("args") or {}).get("name", "")

    fam_us = collections.Counter()
    fam_count = collections.Counter()
    op_us = collections.Counter()
    op_count = collections.Counter()
    total_us = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        tname = thread_names.get((ev["pid"], ev.get("tid")), "")
        if "step" in tname.lower():  # steps track duplicates the op track
            continue
        dur = float(ev.get("dur", 0.0))
        fam = _family(ev.get("name", "?"))
        fam_us[fam] += dur
        fam_count[fam] += 1
        if ops:
            name = ev.get("name", "?").split("/")[-1]
            op_us[name] += dur
            op_count[name] += 1
        total_us += dur

    rows = fam_us.most_common(top)
    out = {
        "trace": path,
        "device_total_ms_per_step": round(total_us / 1000.0 / steps, 3),
        "families": [
            {
                "family": fam,
                "ms_per_step": round(us / 1000.0 / steps, 3),
                "pct": round(100.0 * us / total_us, 1) if total_us else 0.0,
                "count": fam_count[fam],
            }
            for fam, us in rows
        ],
    }
    if ops:
        out["ops"] = [
            {
                "op": name,
                "ms_per_step": round(us / 1000.0 / steps, 3),
                "pct": round(100.0 * us / total_us, 1) if total_us else 0.0,
                "count": op_count[name],
            }
            for name, us in op_us.most_common(ops)
        ]
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--steps", type=int, default=3,
                    help="traced step count (bench.py --trace records 3)")
    ap.add_argument("--ops", type=int, default=0,
                    help="also list the top-N individual ops (fusion.123 etc.)")
    ap.add_argument("--json", action="store_true", help="print raw JSON")
    args = ap.parse_args(argv)
    out = summarize(args.trace_dir, top=args.top, steps=args.steps, ops=args.ops)
    if args.json:
        json.dump(out, sys.stdout, indent=1)
        print()
        return
    print(f"trace: {out['trace']}")
    print(f"device total: {out['device_total_ms_per_step']} ms/step")
    print(f"{'ms/step':>9}  {'%':>5}  {'n':>5}  family")
    for r in out["families"]:
        print(f"{r['ms_per_step']:>9.3f}  {r['pct']:>5.1f}  {r['count']:>5}  {r['family']}")
    if out.get("ops"):
        print(f"\n{'ms/step':>9}  {'%':>5}  {'n':>5}  op")
        for r in out["ops"]:
            print(f"{r['ms_per_step']:>9.3f}  {r['pct']:>5.1f}  {r['count']:>5}  {r['op']}")


if __name__ == "__main__":
    main()
