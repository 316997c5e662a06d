"""Grain-backed input pipeline (multi-process decode + augment).

The built-in threaded loader (wseg_tpu/data/loader.py) is enough for one
host; for production multi-host training this Grain pipeline gives
per-host sharding, deterministic global shuffling, and worker processes
(PIL decode releases the GIL only partially — processes scale better).
Select with ``use_grain=True`` in :func:`make_train_loader`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class GrainLoader:
    """Epoch-iterable matching wseg_tpu.data.loader.DataLoader's surface."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, shard_index: int = 0,
                 shard_count: int = 1):
        import grain.python as pygrain

        self.dataset = dataset
        self.batch_size = batch_size
        self._pygrain = pygrain
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = num_workers
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.shard_count
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_iterator(self):
        """One PERSISTENT infinite iterator: the worker-process pool is
        spawned once and reused across epochs (a fresh pool per epoch
        costs seconds of process spawn + module import per epoch;
        IndexSampler with num_epochs=None reshuffles every pass)."""
        pygrain = self._pygrain
        sampler = pygrain.IndexSampler(
            num_records=len(self.dataset),
            shard_options=pygrain.ShardOptions(
                shard_index=self.shard_index,
                shard_count=self.shard_count,
                drop_remainder=self.drop_last),
            shuffle=self.shuffle,
            seed=self.seed,
            num_epochs=None,
        )

        class _Source:
            def __init__(self, ds):
                self._ds = ds

            def __len__(self):
                return len(self._ds)

            def __getitem__(self, idx):
                return self._ds[int(idx)]

        operations = [
            pygrain.Batch(batch_size=self.batch_size,
                          drop_remainder=self.drop_last),
        ]
        loader = pygrain.DataLoader(
            data_source=_Source(self.dataset),
            sampler=sampler,
            operations=operations,
            worker_count=self.num_workers,
        )
        return iter(loader)

    def __iter__(self):
        if getattr(self, "_it", None) is None:
            self._it = self._make_iterator()
        self.epoch += 1
        for _ in range(len(self)):
            batch = next(self._it)
            # pygrain.Batch stacks leaves when they are arrays; our
            # dataset returns tuples, so batches arrive as tuples of
            # stacked components
            if isinstance(batch, dict):
                yield batch
            else:
                images, labels, names, masks = batch
                images = np.asarray(images)
                if images.dtype != np.uint8:
                    images = images.astype(np.float32)
                yield {
                    "image": images,
                    "labels": np.asarray(labels, np.float32),
                    "name": list(names),
                    "mask": np.asarray(masks),
                }


def make_train_loader(dataset, batch_size: int, use_grain: bool = False,
                      **kwargs):
    if use_grain:
        try:
            return GrainLoader(dataset, batch_size, **kwargs)
        except Exception as e:  # pragma: no cover
            print("grain unavailable, falling back to threads:", e)
    from wseg_tpu.data.loader import DataLoader
    kwargs.pop("shard_index", None)
    kwargs.pop("shard_count", None)
    return DataLoader(dataset, batch_size, **kwargs)
