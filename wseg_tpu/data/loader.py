"""Host-side batched loader with threaded prefetch.

Replaces torch DataLoader (reference datasets/__init__.py:14-30): worker
threads decode+augment with PIL (which releases the GIL for the heavy ops),
batches are stacked into pinned numpy arrays ready for jax.device_put.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import numpy as np


class DataLoader:
    """Minimal epoch-based loader: shuffle, drop_last, prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 4,
                 seed: int = 0, prefetch: int = 4):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0
        self.seed = seed

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed + self.epoch).shuffle(order)
        batches = []
        for s in range(0, n, self.batch_size):
            idx = order[s:s + self.batch_size]
            if len(idx) < self.batch_size and self.drop_last:
                continue
            batches.append(idx)
        return batches

    def __iter__(self) -> Iterator[dict]:
        """Bounded prefetch: workers claim batch indices IN ORDER and
        may only run ``prefetch`` batches ahead of the consumer (a
        permit per in-flight batch — without backpressure a fast worker
        pool decodes the whole epoch into memory).  Completion is
        signalled on a condition variable; no polling.

        Worker exceptions (corrupt image, collate failure) are stashed
        per batch and re-raised in the consumer — a dead worker must
        not leave the consumer waiting forever.  Abandoning the
        iterator mid-epoch (exception in the training loop) releases
        the workers via a stop flag in the generator's ``finally`` so
        threads and buffered batches don't leak across retries."""
        batches = self._index_batches()
        self.epoch += 1
        results = {}
        cond = threading.Condition()
        permits = threading.Semaphore(max(1, self.prefetch))
        claim = iter(enumerate(batches))
        claim_lock = threading.Lock()
        stop = threading.Event()

        def worker():
            while not stop.is_set():
                permits.acquire()
                if stop.is_set():
                    permits.release()
                    return
                with claim_lock:
                    try:
                        i, idx = next(claim)
                    except StopIteration:
                        permits.release()
                        return
                try:
                    samples = [self.dataset[int(k)] for k in idx]
                    batch = self._collate(samples)
                except BaseException as e:  # re-raised by the consumer
                    batch = e
                with cond:
                    results[i] = batch
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        try:
            for next_i in range(len(batches)):
                with cond:
                    while next_i not in results:
                        cond.wait()
                    batch = results.pop(next_i)
                permits.release()
                if isinstance(batch, BaseException):
                    raise batch
                yield batch
        finally:
            stop.set()
            # wake any workers blocked on a permit
            for _ in threads:
                permits.release()

    @staticmethod
    def _collate(samples):
        images = np.stack([s[0] for s in samples])
        if images.dtype != np.uint8:  # device-normalised path ships u8
            images = images.astype(np.float32)
        labels = np.stack([s[1] for s in samples]).astype(np.float32)
        names = [s[2] for s in samples]
        masks = np.stack([s[3] for s in samples])
        batch = {"image": images, "labels": labels, "name": names,
                 "mask": masks}
        for col in zip(*[s[4:] for s in samples]):
            arr = np.stack(col).astype(np.float32)
            # (B, 9) jitter params vs (B, H, W) scoremap stream
            batch["jitter" if arr.ndim == 2 else "score"] = arr
        return batch
