"""Host-side batch loader feeding the TPU.

Replaces torch DataLoader + DistributedSampler (SURVEY.md §2.9): thread-pool
decode workers (audio decode is numpy/scipy and releases the GIL in scipy
FFT/resample), double-buffered prefetch, and per-host sharding for multi-host
data parallelism (each host loads only its 1/num_hosts slice of every batch,
mirroring DistributedSampler semantics).
"""
from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterator, Optional

import numpy as np

__all__ = ["BatchLoader", "LoopIterator"]


def _default_collate(samples):
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return tuple(np.stack([s[i] for s in samples])
                     for i in range(len(first)))
    return np.stack(samples)


class BatchLoader:
    """Iterates (shuffled) batches of a map-style dataset.

    Args:
        dataset: object with __len__ / __getitem__.
        global_batch_size: total batch across all hosts; this host yields
            global_batch_size // num_hosts samples per batch.
    """

    def __init__(self, dataset, global_batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, seed: int = 0,
                 collate_fn: Optional[Callable] = None,
                 num_workers: int = 8, host_id: int = 0, num_hosts: int = 1,
                 prefetch: int = 2):
        assert global_batch_size % num_hosts == 0
        if num_hosts > 1 and not drop_last:
            # A ragged final batch cannot be evenly sharded across hosts
            # (len(batch) // num_hosts would silently drop rows, or yield
            # an empty local slice that crashes collate). Multi-host runs
            # therefore always drop the partial tail — announced, not silent.
            import warnings
            warnings.warn("BatchLoader: multi-host sharding requires equal "
                          "per-host batches; forcing drop_last=True (the "
                          "final partial batch, if any, is skipped)")
            drop_last = True
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // num_hosts
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.collate_fn = collate_fn or _default_collate
        self.num_workers = num_workers
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def _batch_indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            order = np.random.default_rng(
                self.seed + self.epoch).permutation(n)
        usable = (n // self.global_batch_size) * self.global_batch_size \
            if self.drop_last else n
        for start in range(0, usable, self.global_batch_size):
            batch = order[start:start + self.global_batch_size]
            # this host's CONTIGUOUS slice of the global batch: process-
            # local rows concatenated in rank order then reproduce the
            # loader's global row order exactly (what
            # make_array_from_process_local_data assembles), so multi-
            # process training is bitwise-comparable to single-process.
            per = len(batch) // self.num_hosts
            yield batch[self.host_id * per:(self.host_id + 1) * per]

    def __iter__(self) -> Iterator:
        self.epoch += 1
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = queue.Queue()
            batches = self._batch_indices()

            def submit_next():
                try:
                    idxs = next(batches)
                except StopIteration:
                    return False
                pending.put(pool.map(self.dataset.__getitem__, idxs))
                return True

            live = 0
            for _ in range(self.prefetch + 1):
                if submit_next():
                    live += 1
            while live:
                futures = pending.get()
                samples = list(futures)
                if submit_next():
                    live += 1
                live -= 1
                yield self.collate_fn(samples)


class LoopIterator:
    """Step-based looping over a loader (n_steps OR n_epochs), mirroring
    nppc/auxil.py:124-148 (LoopLoader)."""

    def __init__(self, loader, n_steps: Optional[int] = None,
                 n_epochs: Optional[int] = None):
        assert (n_steps is None) != (n_epochs is None), \
            "specify exactly one of n_steps / n_epochs"
        self.loader = loader
        if n_steps is None:
            n_steps = n_epochs * len(loader)
        self.n_steps = n_steps

    def __len__(self) -> int:
        return self.n_steps

    def __iter__(self):
        steps = 0
        while steps < self.n_steps:
            empty = True
            for batch in self.loader:
                empty = False
                if steps >= self.n_steps:
                    return
                yield batch
                steps += 1
            if empty:
                # e.g. BatchLoader(drop_last) over a dataset smaller than
                # one batch: without this the while-loop spins forever
                raise RuntimeError(
                    "LoopIterator: underlying loader yielded no batches "
                    "(dataset smaller than one batch with drop_last?)")
