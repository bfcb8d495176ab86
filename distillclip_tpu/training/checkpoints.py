"""Checkpointing: Orbax save/restore with the reference's retention policy.

Reference policy (image.yaml:93-108, l_clip.yaml:82-97): two ModelCheckpoint
callbacks per stage — top-2 by val accuracy (max) and top-2 by val loss
(min) — plus ``last``.  Filenames embed epoch/acc/loss.

Cross-stage composition (dual_distill_model.py:22-38): stage 3 restores the
stage-1/2 student towers; the reference strips the ``student.`` key prefix,
here :func:`restore_tower_params` extracts the ``student`` subtree of a
stage checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, List, Optional

import jax
import numpy as np

Array = jax.Array


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree via Orbax (async-capable, TPU-host friendly).

    Multi-process: orbax ``save`` is a COLLECTIVE (it syncs all processes
    internally) so EVERY process must call this; filesystem cleanup happens
    on the primary only, with a barrier so no process enters the save while
    the old directory is being removed.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        multihost_utils.sync_global_devices("distillclip:pre_save:" + path)
    elif os.path.exists(path):
        shutil.rmtree(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _tree_to_numpy(tree))


def restore_pytree(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is None:
            return ckptr.restore(path)
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype), template
        )
        return ckptr.restore(path, abstract)


def restore_tower_params(ckpt_path: str, template: Any,
                         tower: Optional[str] = None) -> Any:
    """Restore one student tower from a stage checkpoint.

    Accepts a trainer checkpoint ({'state': {'params': {'student': ...}}},
    the format ``fit`` writes to ``checkpoints/last``), a bare stage tree
    ({'params': {'student': ...}} or {'student': ...}), or a bare tower
    tree; equivalent to the reference's 'student.'-prefix strip
    (dual_distill_model.py:27-33).  ``tower`` selects one tower
    ('image_tower'/'text_tower') out of a stage-3 dual checkpoint so
    ``distillclip score`` can serve straight from the joint run's ckpt.
    """
    restored = restore_pytree(ckpt_path)
    for key in ("state", "params", "student"):
        if isinstance(restored, dict) and key in restored:
            restored = restored[key]
    if tower is not None and isinstance(restored, dict) and tower in restored:
        restored = restored[tower]

    # validate against the template structure
    t_struct = jax.tree_util.tree_structure(template)
    r_struct = jax.tree_util.tree_structure(restored)
    if t_struct != r_struct:
        raise ValueError(
            f"checkpoint tower structure mismatch:\n got {r_struct}\n want {t_struct}"
        )
    return jax.tree_util.tree_map(lambda t, r: np.asarray(r, t.dtype), template, restored)


class CheckpointManager:
    """top-k-by-two-metrics + last retention (reference callbacks)."""

    def __init__(
        self,
        directory: str,
        top_k: int = 2,
        acc_metric: str = "stu_acc_top1",
        loss_metric: str = "loss",
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.top_k = top_k
        self.acc_metric = acc_metric
        self.loss_metric = loss_metric
        self._index_path = os.path.join(self.directory, "index.json")
        self._index: Dict[str, Any] = {"entries": []}
        if os.path.exists(self._index_path):
            with open(self._index_path) as f:
                self._index = json.load(f)

    def _write_index(self):
        with open(self._index_path, "w") as f:
            json.dump(self._index, f, indent=2)

    def save_epoch(self, epoch: int, state_tree: Any, metrics: Dict[str, float]) -> str:
        """Save an epoch checkpoint + refresh 'last'.

        Multi-process: every process must call this (orbax saves are
        collectives); index bookkeeping and retention deletes run on the
        primary only, assuming a SHARED filesystem (the standard TPU-pod
        setup).  Non-primary ranks re-read ``index.json`` in :meth:`best` /
        the index accessors so they see the primary's bookkeeping.

        A metric that is ``None``/absent is recorded as ``None`` and simply
        does not compete for that metric's top-k slots (no 0.0 substitute).
        """
        acc = metrics.get(self.acc_metric)
        loss = metrics.get(self.loss_metric)
        acc = float(acc) if acc is not None else None
        loss = float(loss) if loss is not None else None
        acc_s = f"{acc:.3f}" if acc is not None else "na"
        loss_s = f"{loss:.5f}" if loss is not None else "na"
        name = f"epoch{epoch}-acc{acc_s}-loss{loss_s}"
        path = os.path.join(self.directory, name)
        save_pytree(path, state_tree)

        # refresh 'last' (save_last: True; save_pytree clears the old dir)
        save_pytree(os.path.join(self.directory, "last"), state_tree)

        if jax.process_index() != 0:
            return path
        self._index["entries"].append(
            {"name": name, "epoch": epoch, "acc": acc, "loss": loss}
        )
        self._gc()
        self._write_index()
        return path

    def _gc(self):
        """Keep union of top-k by acc (max) and top-k by loss (min).

        Entries with a ``None`` metric don't compete for that metric's
        slots; an entry with neither metric survives only as 'last'.
        """
        entries = self._index["entries"]
        with_acc = [e for e in entries if e["acc"] is not None]
        with_loss = [e for e in entries if e["loss"] is not None]
        by_acc = sorted(with_acc, key=lambda e: -e["acc"])[: self.top_k]
        by_loss = sorted(with_loss, key=lambda e: e["loss"])[: self.top_k]
        keep = {e["name"] for e in by_acc} | {e["name"] for e in by_loss}
        for e in list(entries):
            if e["name"] not in keep:
                p = os.path.join(self.directory, e["name"])
                if os.path.exists(p):
                    shutil.rmtree(p)
                entries.remove(e)

    def _refresh_index(self):
        """Re-read index.json: on shared filesystems, non-primary ranks (and
        fresh processes) pick up the primary's bookkeeping (advisor r2)."""
        if os.path.exists(self._index_path):
            try:
                with open(self._index_path) as f:
                    self._index = json.load(f)
            except (OSError, json.JSONDecodeError):
                pass  # keep in-memory view if a concurrent write races us

    def best(self, metric: str = "acc") -> Optional[str]:
        if jax.process_index() != 0:
            self._refresh_index()
        if metric == "acc":
            ranked = [e for e in self._index["entries"] if e["acc"] is not None]
            e = max(ranked, key=lambda e: e["acc"], default=None)
        else:
            ranked = [e for e in self._index["entries"] if e["loss"] is not None]
            e = min(ranked, key=lambda e: e["loss"], default=None)
        return os.path.join(self.directory, e["name"]) if e else None

    def last(self) -> Optional[str]:
        p = os.path.join(self.directory, "last")
        return p if os.path.exists(p) else None
