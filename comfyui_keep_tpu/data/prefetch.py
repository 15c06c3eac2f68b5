"""Loader + prefetch (reference data/prefetch_dataloader.py:7-140).

DataLoader: sampler-driven batching over a map-style dataset with worker
threads (cv2/numpy release the GIL, so threads give genuine overlap without
fork overhead). DevicePrefetcher: double-buffered host->HBM feed — the TPU
equivalent of CUDAPrefetcher's side-stream non_blocking H2D copies
(prefetch_dataloader.py:82-140): the next batch is transferred while the
current step runs.
"""
import queue
import threading
from typing import Callable, Dict, Iterable, Iterator, Optional

import numpy as np


def default_collate(samples):
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out


class DataLoader:
    def __init__(self, dataset, batch_size=1, sampler=None, shuffle=False,
                 num_workers=0, collate_fn=default_collate, drop_last=True,
                 seed=0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.collate = collate_fn
        self.drop_last = drop_last
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self):
        if self.sampler is not None:
            return list(iter(self.sampler))
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        return idx

    def __iter__(self) -> Iterator[Dict]:
        indices = self._indices()
        batches = [indices[i:i + self.batch_size]
                   for i in range(0, len(indices), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]

        if self.num_workers <= 0:
            for b in batches:
                yield self.collate([self.dataset[i] for i in b])
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = object()

        def worker(batch_list):
            for b in batch_list:
                q.put(self.collate([self.dataset[i] for i in b]))

        # round-robin split preserving order via per-batch futures
        import concurrent.futures as cf
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures = [pool.submit(
                lambda bb: self.collate([self.dataset[i] for i in bb]), b)
                for b in batches]
            for f in futures:
                yield f.result()


class CPUPrefetcher:
    """Single-step lookahead on a background thread
    (prefetch_dataloader.py CPUPrefetcher)."""

    def __init__(self, loader):
        self.loader = loader
        self._iter = None

    def reset(self):
        self._iter = iter(self.loader)

    def next(self):
        if self._iter is None:
            self.reset()
        try:
            return next(self._iter)
        except StopIteration:
            return None


class DevicePrefetcher:
    """Double-buffered host->device feed: batch N+1 transfers to HBM while
    batch N computes. Replaces CUDAPrefetcher (side CUDA stream H2D)."""

    def __init__(self, loader, sharding=None, keys=("lq", "gt")):
        self.loader = loader
        self.sharding = sharding
        self.keys = keys
        self._queue: "queue.Queue" = queue.Queue(maxsize=2)
        self._thread: Optional[threading.Thread] = None
        self._stop = object()

    def _put_device(self, batch):
        import jax
        out = dict(batch)
        for k in self.keys:
            if k in out:
                arr = out[k]
                out[k] = (jax.device_put(arr, self.sharding)
                          if self.sharding is not None else jax.device_put(arr))
        return out

    def _run(self):
        try:
            for batch in self.loader:
                self._queue.put(self._put_device(batch))
            self._queue.put(self._stop)
        except BaseException as e:  # propagate into next() — a dead worker
            self._queue.put(e)      # must raise, not deadlock the consumer

    def reset(self):
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def next(self):
        if self._thread is None:
            self.reset()
        item = self._queue.get()
        if isinstance(item, BaseException):
            self._thread = None
            raise item
        if item is self._stop:
            self._thread = None
            return None
        return item
