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
        batches = self._index_batches()
        self.epoch += 1
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        in_q: "queue.Queue" = queue.Queue()
        for i, b in enumerate(batches):
            in_q.put((i, b))
        results = {}
        lock = threading.Lock()

        def worker():
            while True:
                try:
                    i, idx = in_q.get_nowait()
                except queue.Empty:
                    return
                samples = [self.dataset[int(k)] for k in idx]
                batch = self._collate(samples)
                with lock:
                    results[i] = batch

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_workers)]
        for t in threads:
            t.start()

        next_i = 0
        total = len(batches)
        import time
        while next_i < total:
            with lock:
                ready = next_i in results
            if ready:
                with lock:
                    yield results.pop(next_i)
                next_i += 1
            else:
                time.sleep(0.002)

    @staticmethod
    def _collate(samples):
        images = np.stack([s[0] for s in samples]).astype(np.float32)
        labels = np.stack([s[1] for s in samples]).astype(np.float32)
        names = [s[2] for s in samples]
        masks = np.stack([s[3] for s in samples])
        batch = {"image": images, "labels": labels, "name": names,
                 "mask": masks}
        if len(samples[0]) > 4:  # optional scoremap stream
            batch["score"] = np.stack(
                [s[4] for s in samples]).astype(np.float32)
        return batch
