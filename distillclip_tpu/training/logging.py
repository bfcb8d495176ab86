"""Metric logging: console + JSONL + optional TensorBoard (tensorboardX).

Replaces the reference's W&B/TensorBoard Lightning loggers
(distil_model.py:70-79, image.yaml:74-82).  W&B is not available in this
environment; the JSONL stream is the machine-readable primary and
TensorBoard is attached when tensorboardX is importable.  Headline metrics
track running maxima like the reference's ``wandb.define_metric
(summary='max')``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

MAX_SUMMARY_KEYS = (
    "val_stu_acc/stu_acc_top1",
    "val_stu_acc/stu_acc_top10",
    "val_stu_acc/stu_acc_top50",
)


class MetricLogger:
    def __init__(self, log_dir: str = "./result", name: str = "run", use_tensorboard: bool = True):
        self.log_dir = os.path.join(log_dir, name)
        os.makedirs(self.log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(self.log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(logdir=os.path.join(self.log_dir, "tb"))
            except ImportError:
                pass
        self._summary_max: Dict[str, float] = {}
        self._t0 = time.time()

    def log_hyperparams(self, params: Dict[str, Any]):
        path = os.path.join(self.log_dir, "hparams.json")
        with open(path, "w") as f:
            json.dump(params, f, indent=2, default=str)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        record = {"step": int(step), "time": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            v = float(v)
            record[k] = v
            if k in MAX_SUMMARY_KEYS:
                self._summary_max[k] = max(self._summary_max.get(k, -1e30), v)
            if self._tb is not None:
                self._tb.add_scalar(k, v, step)
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def log_heatmap(self, key: str, logits, step: int):
        """Persist raw + softmaxed logits heatmaps (reference log_heatmap,
        distil_model.py:180-185; opt-in, not called by default there either)."""
        import numpy as np

        logits = np.asarray(logits, dtype=np.float32)
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        softmax = e / e.sum(axis=1, keepdims=True)
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 2, figsize=(8, 4))
            axes[0].imshow(logits)
            axes[0].set_title(f"{key} logits")
            axes[1].imshow(softmax)
            axes[1].set_title(f"{key} softmax")
            path = os.path.join(self.log_dir, f"heatmap_{key.replace('/', '_')}_{step}.png")
            fig.savefig(path, dpi=80)
            plt.close(fig)
        except ImportError:
            np.savez(
                os.path.join(self.log_dir, f"heatmap_{key.replace('/', '_')}_{step}.npz"),
                logits=logits, softmax=softmax,
            )

    @property
    def summary(self) -> Dict[str, float]:
        return dict(self._summary_max)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class NullLogger:
    """No-op logger for non-zero processes in multi-host runs (the
    reference relied on Lightning's rank-zero-only logging)."""

    def log_hyperparams(self, params):
        pass

    def log_metrics(self, metrics, step):
        pass

    def log_heatmap(self, key, logits, step):
        pass

    @property
    def summary(self):
        return {}

    def close(self):
        pass
