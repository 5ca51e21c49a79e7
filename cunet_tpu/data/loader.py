"""Batching + double-buffered host->device feed.

The reference's input pipeline is torch DataLoader with ``pin_memory=True``,
``num_workers`` forked workers, and ``non_blocking=True`` H2D copies
(ref:cu-net.py:82-90,164-165). The TPU-native analog (SURVEY.md §2.6):

- a thread pool assembles numpy batches (PIL/numpy release the GIL for the
  heavy parts);
- ``prefetch_to_device`` keeps ``depth`` batches in flight on device via
  ``jax.device_put``, overlapping H2D DMA with the running step — the
  equivalent of pinned-memory + non_blocking copies under XLA's async
  dispatch model.
"""

from __future__ import annotations

import collections
import concurrent.futures as cf
import itertools
from typing import Callable, Iterable, Iterator, Optional

import jax
import numpy as np


def collate(samples) -> dict:
    """Stack a list of sample dicts into a dict of batched arrays."""
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples], axis=0)
    return out


class DataLoader:
    """Minimal epoch iterator over an indexable dataset.

    drop_last=True for training (static batch shapes keep XLA from
    recompiling; the reference relied on dynamic shapes instead).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = True,
        num_threads: int = 0,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_threads = num_threads
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(order)
        n_batches = len(self)
        batches = [
            order[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        if self.num_threads <= 1:
            for idxs in batches:
                yield collate([self.dataset[int(i)] for i in idxs])
            return
        with cf.ThreadPoolExecutor(self.num_threads) as pool:
            # pipeline: keep 2 batches of sample futures in flight
            pending = collections.deque()
            it = iter(batches)
            for idxs in itertools.islice(it, 2):
                pending.append([pool.submit(self.dataset.__getitem__, int(i)) for i in idxs])
            while pending:
                futs = pending.popleft()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(
                        [pool.submit(self.dataset.__getitem__, int(i)) for i in nxt]
                    )
                yield collate([f.result() for f in futs])


def prefetch_to_device(
    iterator: Iterable[dict],
    *,
    sharding=None,
    depth: int = 2,
) -> Iterator[dict]:
    """Double-buffered device feed: keep ``depth`` batches resident ahead of
    the consumer. ``sharding`` may be a NamedSharding (pjit path), a Device,
    or None (default device)."""
    queue = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.tree_util.tree_map(jnp_device_put_default, batch)
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)

    it = iter(iterator)
    for batch in itertools.islice(it, depth):
        queue.append(put(batch))
    while queue:
        nxt = next(it, None)
        if nxt is not None:
            queue.append(put(nxt))
        yield queue.popleft()


def jnp_device_put_default(x):
    return jax.device_put(x)
