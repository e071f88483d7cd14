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


class NativeLoader:
    """Loader over the C++ ARS batch sampler (rave_tpu/data/native.py):
    record fetch + crop + dither + phase mangle run in native threads.
    API-compatible with Loader for the standard (augmentation-free)
    pipeline."""

    def __init__(
        self,
        db_path: str,
        indices: Sequence[int],
        batch: int,
        crop: int,
        sr: int,
        seed: int = 0,
        shuffle: bool = True,
        host_id: int = 0,
        host_count: int = 1,
        drop_last: bool = True,
        prefetch: int = 4,
    ):
        from rave_tpu.data.native import NativeSampler
        from rave_tpu.data.store import read_metadata

        meta = read_metadata(db_path)
        if meta.get("lazy", False):
            raise RuntimeError("native loader requires a non-lazy ARS store")
        self.sampler = NativeSampler(
            db_path, meta["num_signal"], meta["channels"], crop, sr, seed=seed
        )
        self.indices = np.asarray(indices)[host_id::host_count]
        self.batch = batch
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch

    def __len__(self):
        if self.drop_last:
            return len(self.indices) // self.batch
        return -(-len(self.indices) // self.batch)

    def epoch(self, epoch: int = 0) -> Iterator[np.ndarray]:
        rng = np.random.default_rng((self.seed, epoch))
        order = (
            rng.permutation(len(self.indices))
            if self.shuffle
            else np.arange(len(self.indices))
        )
        idx = self.indices[order]
        nb = len(self)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)

        def producer():
            for b in range(nb):
                rows = idx[b * self.batch : (b + 1) * self.batch]
                q.put(self.sampler.sample(rows, epoch_tag=epoch + 1))
            q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            yield item

    def forever(self) -> Iterator[np.ndarray]:
        e = 0
        while True:
            yield from self.epoch(e)
            e += 1
