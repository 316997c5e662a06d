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

        # batching happens host-side in __iter__ (np.stack of decoded
        # records is cheap): a grain Batch op on the infinite stream
        # would straddle shuffle-pass boundaries whenever batch_size
        # does not divide the shard size, drifting epoch boundaries and
        # repeating/skipping records within a nominal epoch (the torch
        # DataLoader drop_last semantics are per-pass)
        loader = pygrain.DataLoader(
            data_source=_Source(self.dataset),
            sampler=sampler,
            operations=[],
            worker_count=self.num_workers,
        )
        return iter(loader)

    def _records_per_pass(self):
        """Records THIS shard yields per shuffle pass.  ShardOptions
        drops the shard remainder only with drop_remainder=True
        (= self.drop_last); otherwise grain gives the first
        ``n % count`` shards one extra record each."""
        n = len(self.dataset)
        if self.shard_count > 1:
            base, extra = divmod(n, self.shard_count)
            n = base
            if not self.drop_last and self.shard_index < extra:
                n += 1
        return n

    def _stack(self, records):
        cols = list(zip(*records))
        images, labels, names, masks = cols[:4]
        images = np.stack(images)
        if images.dtype != np.uint8:
            images = images.astype(np.float32)
        out = {
            "image": images,
            "labels": np.stack(labels).astype(np.float32),
            "name": list(names),
            "mask": np.stack(masks),
        }
        for col in cols[4:]:
            arr = np.stack(col).astype(np.float32)
            # (B, 9) jitter params vs (B, H, W) scoremap stream
            out["jitter" if arr.ndim == 2 else "score"] = arr
        return out

    def __iter__(self):
        if getattr(self, "_it", None) is None:
            self._it = self._make_iterator()
        self.epoch += 1
        # consume EXACTLY one shuffle pass: yield full batches, drop
        # (but still drain) the pass remainder so the next epoch starts
        # on its own pass
        n = self._records_per_pass()
        n_full = n // self.batch_size
        for _ in range(n_full):
            yield self._stack([next(self._it)
                               for _ in range(self.batch_size)])
        rem = n - n_full * self.batch_size
        tail = [next(self._it) for _ in range(rem)]
        if tail and not self.drop_last:
            yield self._stack(tail)


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
