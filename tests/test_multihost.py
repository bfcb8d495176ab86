"""Multi-host readiness (VERDICT r1 item 9).

The reference's multi-GPU story is Lightning DDP process spawn + NCCL
(main.py:25, image.yaml:67), never tested without hardware.  Here the
equivalent is jax.distributed + per-process data shards, validated on CPU:
2 processes x 4 virtual devices with gloo collectives run one full joint
training step and must agree on the loss bit-for-bit.
"""

import os
import subprocess
import sys

import numpy as np

from distillclip_tpu.data.loader import DataLoader, MapDataset


class _Rows(MapDataset):
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        return {"inputs": np.asarray([idx], np.int32)}


def test_loader_process_shards_partition_equally():
    """Shards are disjoint, equal-sized, and drop the uneven remainder
    (the reference's ddp_equalize, text_image_datamodule.py:80)."""
    n, batch, shards = 37, 4, 3
    loaders = [
        DataLoader(_Rows(n), batch_size=batch, shuffle=True, seed=7,
                   num_shards=shards, shard_index=i, num_threads=1)
        for i in range(shards)
    ]
    assert len({len(l) for l in loaders}) == 1  # equalized batch counts
    seen = []
    for l in loaders:
        for b in l:
            seen.extend(int(x) for x in b["inputs"][:, 0])
    assert len(seen) == len(set(seen)), "shards overlap"
    assert len(seen) == len(loaders[0]) * batch * shards
    # same permutation seed -> same global coverage across epochs
    loaders[0].set_epoch(1)
    epoch1 = [int(x) for b in loaders[0] for x in b["inputs"][:, 0]]
    assert epoch1 != seen[: len(epoch1)] or n <= batch  # reshuffled


def test_loader_shard_index_validation():
    import pytest

    with pytest.raises(ValueError, match="shard_index"):
        DataLoader(_Rows(8), batch_size=2, num_shards=2, shard_index=2)


def test_multihost_dryrun_two_processes():
    """2 CPU processes x 2 virtual devices: gloo collectives, sharded
    batch assembly, one full train step, identical losses.

    (2x2 rather than the standalone dryrun's 2x4: the pytest parent holds
    its own 8-device XLA runtime on this 1-core box, and the smaller gloo
    mesh keeps the nested run inside the suite's time budget.  The driver
    exercises 2x4 via ``__graft_entry__.py --dryrun-hosts 2``.)
    """
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import __graft_entry__ as g; g.dryrun_multihost(2, 2)" % root],
        env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multihost(2x2): OK" in proc.stdout, proc.stdout


def test_multiprocess_trainer_fit(tmp_path):
    """Full Trainer.fit across 2 processes x 2 devices: per-process loader
    shards, global batch assembly, rank-0-only logging/checkpoints."""
    import socket

    import torch

    from distillclip_tpu.tools.fabricate_teacher import make_clip_state_dict

    ckpt = str(tmp_path / "tiny_mh.pt")
    torch.save(
        make_clip_state_dict(
            vision_width=64, vision_layers=2, patch_size=8, image_resolution=32,
            text_width=64, text_layers=2, context_length=16, vocab_size=512,
            embed_dim=48,
        ),
        ckpt,
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child = os.path.join(root, "tests", "_mh_fit_child.py")
    procs = []
    for i in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                            "--xla_cpu_collective_call_terminate_timeout_seconds=600")
        env["JAX_PLATFORMS"] = "cpu"
        env["MH_COORD"] = f"127.0.0.1:{port}"
        procs.append(subprocess.Popen(
            [sys.executable, child, str(i), "2", str(tmp_path), ckpt],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            cwd=root,
        ))
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=1200)
        assert p.returncode == 0, f"child {i}: {err[-3000:]}"
        assert f"MHFIT {i} devices=4 procs=2 OK" in out, out

    # rank-0-only side effects: one metrics stream, checkpoints exist
    metrics = tmp_path / "mhfit" / "metrics.jsonl"
    assert metrics.exists()
    import json

    lines = [json.loads(l) for l in open(metrics)]
    train = [d for d in lines if "train_loss/loss" in d]
    assert len(train) == 4, f"expected 4 logged steps, got {len(train)}"
    assert (tmp_path / "mhfit" / "checkpoints" / "last").exists()
