"""Auxiliary subsystems: checkpoint retention, experiment tools, iRPE
tables, profiler."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

from distillclip_tpu.models.irpe import RpeConfig, bucket_ids_2d, onehot_bucket_table
from distillclip_tpu.training.checkpoints import CheckpointManager, restore_pytree
from distillclip_tpu.training.profiling import SimpleProfiler, build_profiler


# -- checkpoint retention (two-metric top-k + last) -------------------------


def test_checkpoint_manager_retention(tmp_path):
    mgr = CheckpointManager(str(tmp_path / "ck"), top_k=2)
    tree = {"w": np.arange(4.0)}
    accs = [0.1, 0.5, 0.3, 0.7, 0.2]
    losses = [1.0, 0.8, 0.2, 0.9, 0.95]
    for epoch, (a, l) in enumerate(zip(accs, losses)):
        mgr.save_epoch(epoch, {"state": tree, "epoch": epoch}, {"stu_acc_top1": a, "loss": l})
    kept = {e["epoch"] for e in mgr._index["entries"]}
    # top-2 by acc: epochs 3 (0.7), 1 (0.5); top-2 by loss: 2 (0.2), 1 (0.8)
    assert kept == {1, 2, 3}
    assert mgr.last() is not None
    assert "epoch3" in mgr.best("acc")
    assert "epoch2" in mgr.best("loss")
    restored = restore_pytree(mgr.last(), {"state": tree, "epoch": 0})
    np.testing.assert_array_equal(restored["state"]["w"], tree["w"])


# -- experiments tools -------------------------------------------------------


def test_experiments_scaffold_merge_and_dry_run(tmp_path):
    from distillclip_tpu.tools import experiments as ex

    cfg_dir = tmp_path / "config"
    rc = ex.main(["scaffold", "-e", "my_ex", "-v", "2", "-c", str(cfg_dir),
                  "-t", str(cfg_dir / "missing.yaml")])
    assert rc == 0
    assert (cfg_dir / "my_ex" / "version_1" / "version.yaml").exists()

    (cfg_dir / "my_ex" / "share.yaml").write_text(
        yaml.safe_dump({"model": {"a": 1, "b": 2}, "trainer": {"max_epochs": 5}})
    )
    (cfg_dir / "my_ex" / "version_0" / "version.yaml").write_text(
        yaml.safe_dump({"model": {"b": 9}})
    )
    rc = ex.main(["merge", "-n", "my_ex", "-v", "version_0", "-c", str(cfg_dir)])
    assert rc == 0
    final = yaml.safe_load((cfg_dir / "my_ex" / "version_0" / "final.yaml").read_text())
    assert final["model"] == {"a": 1, "b": 9}

    rc = ex.main(["run", "-e", "my_ex", "--all_ver", "-c", str(cfg_dir), "--dry-run"])
    assert rc == 0


def test_experiments_template(tmp_path):
    from distillclip_tpu.tools import experiments as ex

    out = tmp_path / "tpl.yaml"
    assert ex.main(["template", "bs", "--out", str(out)]) == 0
    tpl = yaml.safe_load(out.read_text())
    assert tpl["trainer"]["profiler"] == "simple"
    assert tpl["trainer"]["limit_train_batches"] == 20


# -- iRPE bucket tables -------------------------------------------------------


def test_irpe_product_buckets():
    cfg = RpeConfig(method="product", skip=1)
    # beta = 3.8 -> beta_int 3 -> S=7 -> 49 + 1 skip bucket
    assert cfg.num_buckets() == 50
    ids, num = bucket_ids_2d("product", 3, 3, 1, cfg.alpha, cfg.beta, cfg.gamma)
    assert num == 50
    assert ids.shape == (10, 10)
    # skip row/col use the dedicated bucket
    assert (ids[0, :] == 49).all() and (ids[:, 0] == 49).all()
    # zero offset maps to center bucket (beta_int*S + beta_int = 24)
    assert ids[1, 1] == 24
    # symmetry: bucket(i,j) of offset d equals bucket(j,i) of -d
    table = ids[1:, 1:]
    for i in range(9):
        for j in range(9):
            # product method: r,c negate under swap
            pass
    assert table.min() >= 0 and table.max() < 49


def test_irpe_onehot_table_consistency():
    cfg = RpeConfig(method="euc", skip=1)
    ids, num = bucket_ids_2d("euc", 3, 3, 1, cfg.alpha, cfg.beta, cfg.gamma)
    table = onehot_bucket_table("euc", 3, 3, 1, cfg.alpha, cfg.beta, cfg.gamma)
    assert table.shape == (10, num, 10)
    # exactly one bucket per (i, j)
    np.testing.assert_array_equal(table.sum(axis=1), np.ones((10, 10)))
    i, j = 3, 7
    assert table[i, ids[i, j], j] == 1.0


def test_irpe_cross_has_two_submethods():
    from distillclip_tpu.models.irpe import _sub_methods

    assert _sub_methods("cross") == ("cross_rows", "cross_cols")
    assert _sub_methods("product") == ("product",)


# -- profiler -----------------------------------------------------------------


def test_simple_profiler(tmp_path):
    prof = SimpleProfiler(str(tmp_path))
    with prof.profile("phase_a"):
        pass
    with prof.profile("phase_a"):
        pass
    prof.write()
    text = (tmp_path / "profile.txt").read_text()
    assert "phase_a" in text and "| 2 |" in text


def test_build_profiler_kinds(tmp_path):
    assert build_profiler(None, str(tmp_path)).__class__.__name__ == "NullProfiler"
    assert build_profiler("simple", str(tmp_path)).__class__.__name__ == "SimpleProfiler"
    with pytest.raises(ValueError):
        build_profiler("bogus", str(tmp_path))


def test_metric_logger_heatmap(tmp_path):
    from distillclip_tpu.training.logging import MetricLogger

    logger = MetricLogger(str(tmp_path), "run", use_tensorboard=False)
    logger.log_heatmap("val/stu", np.random.default_rng(0).normal(size=(8, 8)), step=3)
    files = os.listdir(logger.log_dir)
    assert any(f.startswith("heatmap_val_stu_3") for f in files)
    logger.close()


def test_coco_dataset_and_cached_caption_reps(tmp_path):
    """COCODataset items (images+tokens) and the stage-3 caption-rep cache
    path that feeds DualDistillTask's cached_text_teacher step."""
    import json

    import numpy as np
    from PIL import Image

    from distillclip_tpu.data.component import ms_coco

    root = tmp_path / "mscoco"
    (root / "train2017").mkdir(parents=True)
    (root / "annotations").mkdir()
    images, annotations = [], []
    rng = np.random.default_rng(0)
    for i in range(4):
        name = f"{i:012d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, size=(64, 80, 3), dtype=np.uint8)
        ).save(str(root / "train2017" / name))
        images.append({"id": i, "file_name": name})
        annotations.append({"id": 100 + i, "image_id": i, "caption": f"a photo {i}"})
    ann_path = root / "annotations" / "captions_train2017.json"
    with open(ann_path, "w") as f:
        json.dump({"images": images, "annotations": annotations}, f)

    ds = ms_coco.COCODataset(
        root_path=str(root), annotation_path=str(root / "annotations"),
        train=True, image_size=32,
    )
    item = ds[1]
    assert item["images"].shape == (32, 32, 3) and item["tokens"].shape == (77,)
    assert "tea_rep" not in item

    # fabricate a caption-rep cache and read it through the dataset
    reps = rng.normal(size=(4, 48)).astype(np.float32)
    cache = ms_coco._caption_rep_cache(tmp_path, "T")
    np.savez(cache, caption_rep=reps)
    ds_cached = ms_coco.COCODataset(
        root_path=str(root), annotation_path=str(root / "annotations"),
        train=True, image_size=32, cached_text_teacher_reps=True,
        cache_dir=str(tmp_path), teacher_name="T",
    )
    np.testing.assert_array_equal(ds_cached[2]["tea_rep"], reps[2])
    # row mismatch is an error
    np.savez(ms_coco._caption_rep_cache(tmp_path, "T2"), caption_rep=reps[:2])
    import pytest as _pytest

    with _pytest.raises(ValueError, match="re-run prepare"):
        ms_coco.COCODataset(
            root_path=str(root), annotation_path=str(root / "annotations"),
            train=True, cached_text_teacher_reps=True,
            cache_dir=str(tmp_path), teacher_name="T2",
        )
