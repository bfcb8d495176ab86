"""Reflection-driven data module (reference data/main_datamodule.py).

``dataset`` names a module under ``distillclip_tpu.data.component``;
``dataset_name`` the class inside it.  Constructor kwargs are filtered by
the class signature (main_datamodule.py:83-98), and a module-level
``prepare(args)`` hook runs one-time host-side work such as teacher
pre-encoding (main_datamodule.py:39-41).
"""

from __future__ import annotations

import importlib
import inspect
from typing import Any, Dict, Optional

from distillclip_tpu.data.loader import DataLoader


class DevicePrestagedLoader:
    """Wraps a DataLoader: first pass uploads each batch to the mesh
    (sharded over data) and caches the DEVICE arrays; later passes replay
    them with zero host->device traffic.

    For datasets that fit in HBM — synthetic perf runs
    (configs/bench_fit_lclip.yaml) and small corpora — this removes the
    per-step transfer from the train loop, isolating trainer+compute
    (the bench bare-step's input regime).  The batch ORDER repeats across
    epochs (device cache), so it is a perf-measurement tool, not a
    substitute for shuffled streaming training.
    """

    def __init__(self, loader):
        self._loader = loader
        self._cache = None

    def __len__(self):
        return len(self._loader)

    def __iter__(self):
        from distillclip_tpu.parallel.mesh import create_mesh, shard_batch

        if self._cache is None:
            mesh = create_mesh()
            cache = []
            for batch in self._loader:
                cache.append(shard_batch(mesh, batch))
            self._cache = cache
        return iter(self._cache)


class MainDataModule:
    def __init__(
        self,
        dataset_para: Dict[str, Any],
        dataset: str,
        dataset_name: str,
        prepare_para: Optional[Dict[str, Any]] = None,
        num_workers: int = 8,
        train_batch_size: int = 128,
        val_batch_size: int = 1250,
        seed: int = 2022,
        prestage_device: bool = False,
    ):
        self.prestage_device = prestage_device
        self.num_workers = num_workers
        self.dataset = dataset
        self.dataset_para = dataset_para
        self.dataset_name = dataset_name
        self.train_batch_size = train_batch_size
        self.val_batch_size = val_batch_size
        self.seed = seed

        self.data_module = self.load_data_module()
        self.prepare_function = self.load_prepare()
        self.prepare_function_args = prepare_para
        if self.prepare_function_args:
            self.prepare_function_args.update(dataset_para)
        self.trainset = None
        self.valset = None
        self.testset = None

    # -- reflection (main_datamodule.py:63-98) -----------------------------

    def _module(self):
        return importlib.import_module(
            "distillclip_tpu.data.component." + self.dataset
        )

    def load_prepare(self):
        return getattr(self._module(), "prepare", None)

    def load_data_module(self):
        try:
            return getattr(self._module(), self.dataset_name)
        except (ImportError, AttributeError):
            raise ValueError(
                f"Invalid Dataset File Name or Invalid Class Name "
                f"data.{self.dataset}.{self.dataset_name}"
            )

    def instancialize(self, **other_args):
        class_args = inspect.signature(self.data_module.__init__).parameters
        args1 = {k: self.dataset_para[k] for k in class_args if k in self.dataset_para}
        args1.update(other_args)
        return self.data_module(**args1)

    # -- lifecycle ----------------------------------------------------------

    def prepare_data(self) -> None:
        if self.prepare_function and self.prepare_function_args is not None:
            self.prepare_function(self.prepare_function_args)

    def setup(self, stage: Optional[str] = None):
        if stage in ("fit", None):
            self.trainset = self.instancialize(train=True)
            self.valset = self.instancialize(train=False)
        if stage in ("test", None):
            self.testset = self.instancialize(train=False)

    @staticmethod
    def _shard_kwargs():
        """Per-process data sharding for multi-host runs (the Lightning DDP
        sampler equivalent): each process loads its slice of the epoch."""
        import jax

        if jax.process_count() > 1:
            return {"num_shards": jax.process_count(),
                    "shard_index": jax.process_index()}
        return {}

    def train_dataloader(self) -> DataLoader:
        loader = DataLoader(
            self.trainset,
            batch_size=self.train_batch_size,
            shuffle=True,
            drop_last=True,
            seed=self.seed,
            num_threads=self.num_workers,
            **self._shard_kwargs(),
        )
        if self.prestage_device:
            return DevicePrestagedLoader(loader)
        return loader

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.valset,
            batch_size=self.val_batch_size,
            shuffle=False,
            drop_last=True,  # static shapes under jit; mirrors ddp_equalize
            num_threads=self.num_workers,
            **self._shard_kwargs(),
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(
            self.testset,
            batch_size=self.val_batch_size,
            shuffle=False,
            drop_last=True,
            num_threads=self.num_workers,
            **self._shard_kwargs(),
        )
