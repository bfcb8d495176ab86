"""Host input pipeline: shuffling, batching, threaded prefetch.

Replaces torch DataLoader (reference main_datamodule.py:53-61).  Design for
TPU hosts: worker THREADS (PIL/numpy release the GIL in decode/resize),
drop-remainder batching so every step has a static shape (XLA requirement —
and the equivalent of webdataset's ``ddp_equalize``,
text_image_datamodule.py:80), and a bounded prefetch queue that overlaps
host decode with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


class MapDataset:
    """Protocol: __len__ + __getitem__ -> pytree of numpy arrays/scalars."""

    def __len__(self):  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - interface
        raise NotImplementedError


def _stack_tree(items: List[Any]):
    first = items[0]
    if isinstance(first, dict):
        return {k: _stack_tree([it[k] for it in items]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(_stack_tree([it[i] for it in items]) for i in range(len(first)))
    if isinstance(first, str):
        return list(items)
    return np.stack([np.asarray(it) for it in items], axis=0)


class DataLoader:
    """Epoch-based loader over a MapDataset.

    * ``shuffle``: per-epoch permutation from a seeded generator (the
      reference relies on Lightning's seed_everything(2022), main.py:24).
    * ``drop_last`` defaults True for train (static shapes for jit).
    * ``num_threads`` workers decode items; one collator thread preserves
      batch ORDER determinism regardless of worker timing.
    """

    def __init__(
        self,
        dataset: MapDataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: Optional[bool] = None,
        seed: int = 2022,
        num_threads: int = 8,
        prefetch: int = 4,
        num_shards: int = 1,
        shard_index: int = 0,
    ):
        """``num_shards``/``shard_index``: per-PROCESS data sharding for
        multi-host runs — each process loads only its interleaved slice of
        the (identically seeded) epoch permutation, and every shard sees
        the same number of batches (the reference's ``ddp_equalize``,
        text_image_datamodule.py:80).  ``batch_size`` is the per-process
        batch; the global batch is ``batch_size * num_shards``.
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = shuffle if drop_last is None else drop_last
        self.seed = seed
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        if not (0 <= shard_index < num_shards):
            raise ValueError(f"shard_index {shard_index} not in [0, {num_shards})")
        self.num_shards = num_shards
        self.shard_index = shard_index
        self._epoch = 0

    def set_epoch(self, epoch: int):
        self._epoch = epoch

    def __len__(self):
        n = len(self.dataset) // self.num_shards
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            indices = rng.permutation(n)
        else:
            indices = np.arange(n)
        if self.num_shards > 1:
            # equalize: every shard gets exactly len(self) * batch items
            usable = (n // self.num_shards) * self.num_shards
            indices = indices[:usable][self.shard_index :: self.num_shards]
        return indices

    def __iter__(self) -> Iterator[Any]:
        indices = self._epoch_indices()
        n_batches = len(self)
        if n_batches == 0:
            return
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def produce():
            try:
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    if self.num_threads > 1 and len(batch_idx) > 1:
                        items = [None] * len(batch_idx)
                        # chunked threading inside one batch
                        def work(lo, hi):
                            for j in range(lo, hi):
                                items[j] = self.dataset[int(batch_idx[j])]

                        chunk = -(-len(batch_idx) // self.num_threads)
                        threads = [
                            threading.Thread(
                                target=work, args=(t * chunk, min((t + 1) * chunk, len(batch_idx)))
                            )
                            for t in range(self.num_threads)
                            if t * chunk < len(batch_idx)
                        ]
                        for t in threads:
                            t.start()
                        for t in threads:
                            t.join()
                    else:
                        items = [self.dataset[int(i)] for i in batch_idx]
                    out_q.put(_stack_tree(items))
                out_q.put(None)
            except BaseException as e:  # surface worker errors to the consumer
                out_q.put(e)

        producer = threading.Thread(target=produce, daemon=True)
        producer.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
