"""Host-side batch loader with background prefetch.

Replaces Lightning's DataLoader worker pool (reference scripts/train.py:
177-182) with a thread-pool sampler + a device-prefetch queue: transform
work (numpy/scipy) overlaps TPU step time, and each host samples only its
own shard of the index space under multi-host DP (SURVEY.md §2.13).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence

import numpy as np


class Loader:
    def __init__(
        self,
        dataset,
        indices: Sequence[int],
        batch: int,
        seed: int = 0,
        shuffle: bool = True,
        workers: int = 8,
        prefetch: int = 4,
        host_id: int = 0,
        host_count: int = 1,
        drop_last: bool = True,
    ):
        self.dataset = dataset
        # per-host shard of the sample index space
        self.indices = np.asarray(indices)[host_id::host_count]
        self.batch = batch
        self.seed = seed
        self.shuffle = shuffle
        self.workers = workers
        self.prefetch = prefetch
        self.drop_last = drop_last

    def __len__(self):
        if self.drop_last:
            return len(self.indices) // self.batch
        return -(-len(self.indices) // self.batch)

    def epoch(self, epoch: int = 0) -> Iterator[np.ndarray]:
        """Yield [B, T, C] float32 batches for one epoch."""
        rng = np.random.default_rng((self.seed, epoch))
        order = (
            rng.permutation(len(self.indices))
            if self.shuffle
            else np.arange(len(self.indices))
        )
        idx = self.indices[order]
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(max_workers=self.workers)

        def make_batch(b):
            rows = idx[b * self.batch : (b + 1) * self.batch]
            seeds = [(self.seed, epoch, int(i)) for i in rows]
            xs = [
                self.dataset.get(int(i), np.random.default_rng(s))
                for i, s in zip(rows, seeds)
            ]
            return np.stack(xs).astype(np.float32)

        def producer():
            futures = [pool.submit(make_batch, b) for b in range(nb)]
            for f in futures:
                q.put(f.result())
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item
        pool.shutdown(wait=False)

    def forever(self) -> Iterator[np.ndarray]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1
