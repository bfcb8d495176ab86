"""Profiling: per-phase wall-time summary + XLA trace capture.

TPU equivalents of the reference's opt-in Lightning profilers
(SimpleProfiler / AdvancedProfiler wired by sh/gene_template.py:68-100):

* ``simple`` — accumulate wall time per named phase, write a summary table
  (SimpleProfiler analog).
* ``trace``  — capture a jax.profiler trace (Perfetto/TensorBoard readable)
  for the first few steps (AdvancedProfiler analog).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, Optional


class SimpleProfiler:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.times: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def profile(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        rows = ["| phase | total s | calls | mean ms |", "|---|---|---|---|"]
        for name in sorted(self.times, key=lambda n: -self.times[n]):
            t, c = self.times[name], self.counts[name]
            rows.append(f"| {name} | {t:.3f} | {c} | {t / max(c, 1) * 1000:.2f} |")
        return "\n".join(rows)

    def write(self):
        os.makedirs(self.out_dir, exist_ok=True)
        with open(os.path.join(self.out_dir, "profile.txt"), "w") as f:
            f.write(self.summary() + "\n")


class TraceProfiler:
    """jax.profiler trace for the first ``trace_steps`` train steps."""

    def __init__(self, out_dir: str, trace_steps: int = 5):
        self.out_dir = os.path.join(out_dir, "jax_trace")
        self.trace_steps = trace_steps
        self._active = False
        self._seen = 0

    def maybe_start(self):
        if not self._active and self._seen == 0:
            import jax

            os.makedirs(self.out_dir, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True

    def step(self):
        if self._active:
            self._seen += 1
            if self._seen >= self.trace_steps:
                self.stop()

    def stop(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False

    @contextlib.contextmanager
    def profile(self, name: str):  # interface-compatible no-op
        yield

    def write(self):
        self.stop()


class NullProfiler:
    @contextlib.contextmanager
    def profile(self, name: str):
        yield

    def maybe_start(self):
        pass

    def step(self):
        pass

    def write(self):
        pass


def build_profiler(kind: Optional[str], out_dir: str):
    if kind in (None, "", "none"):
        return NullProfiler()
    if kind == "simple":
        return SimpleProfiler(out_dir)
    if kind in ("trace", "advanced"):
        return TraceProfiler(out_dir)
    raise ValueError(f"unknown profiler {kind!r} (use simple|trace)")
