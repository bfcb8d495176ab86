"""Bench watchdog tests: the retry loop and last-good-history fallback.

Round 3's official throughput record was 0.0 because a single-shot backend
probe hit a transient tunnel outage (BENCH_r03.json, VERDICT r3 item 1).
These tests simulate outages and assert the bench (a) retries within its
budget, (b) recovers when the backend comes back mid-outage, and (c) on
final failure emits value 0.0 with the newest committed measurement
attached as clearly-stale detail.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

pytestmark = pytest.mark.quick


def test_retry_exhausts_budget_and_reports_failure():
    calls = []
    clock_t = [0.0]

    def probe(timeout_s):
        calls.append(timeout_s)
        clock_t[0] += timeout_s  # a hung probe consumes its full timeout
        return False

    def sleep(s):
        assert s <= 30.0
        clock_t[0] += s

    attempts = bench.wait_for_backend(
        probe_s=120, retry_s=600, probe=probe, sleep=sleep,
        clock=lambda: clock_t[0])
    assert attempts == 0
    # 600s budget / (120s probe + 30s sleep) -> 5 probes, not 1
    assert len(calls) >= 4


def test_retry_recovers_mid_outage():
    state = {"n": 0}

    def probe(timeout_s):
        state["n"] += 1
        return state["n"] >= 3  # backend comes back on the third probe

    attempts = bench.wait_for_backend(
        probe_s=1, retry_s=10_000, probe=probe, sleep=lambda s: None)
    assert attempts == 3


def test_last_good_history_skips_garbage_and_zeros(tmp_path):
    p = tmp_path / "hist.jsonl"
    p.write_text(
        "not json\n"
        + json.dumps({"value": 2900.0, "ts": "old"}) + "\n"
        + json.dumps({"value": 0.0, "ts": "outage"}) + "\n"
        + "\n"
    )
    entry = bench.last_good_history(str(p))
    assert entry == {"value": 2900.0, "ts": "old"}
    assert bench.last_good_history(str(tmp_path / "missing.jsonl")) is None


def test_append_history_roundtrips(tmp_path):
    p = tmp_path / "hist.jsonl"
    bench.append_history({"value": 123.4, "detail": {"stage": "l_clip"}},
                         path=str(p))
    entry = bench.last_good_history(str(p))
    assert entry["value"] == 123.4
    assert "ts" in entry


def test_outage_end_to_end_emits_stale_last_good(tmp_path):
    """Full bench.py run under a simulated outage: rc=2, value 0.0,
    detail.stale true, detail.last_good = newest committed measurement."""
    hist = tmp_path / "hist.jsonl"
    hist.write_text(json.dumps(
        {"value": 2971.0, "unit": "pairs/s/chip", "ts": "2026-08-18"}) + "\n")
    env = dict(os.environ)
    env.update(
        DISTILLCLIP_BENCH_PROBE_CMD="false",  # every probe fails
        DISTILLCLIP_BENCH_PROBE_S="5",
        DISTILLCLIP_BENCH_RETRY_S="2",
        DISTILLCLIP_BENCH_HISTORY=str(hist),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=120, env=env)
    assert proc.returncode == 2, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert out["vs_baseline"] == 0.0
    assert out["detail"]["stale"] is True
    assert out["detail"]["last_good"]["value"] == 2971.0
    # the retry loop actually ran (probe failures logged to stderr)
    assert "probe 1 failed" in proc.stderr
