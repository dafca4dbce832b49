"""Host -> HBM streaming: threaded decode + double-buffered device_put.

Replaces the reference's DataLoader worker processes
(train_gta2cityscapes_multi.py:235-238, num_workers=4, pin_memory) with a
TPU-native feed: a thread pool decodes/augments PIL images while
`jax.device_put` (optionally with a `NamedSharding` for a data-parallel
mesh) stages the *next* batch into HBM as the current step runs, so input
never sits on the critical path at AdaptSegNet batch sizes.

For multi-host: shard the file list by `jax.process_index()` at list-build
time and pass the global-batch sharding here; device_put with a sharding
places only the local shard on local devices.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Iterator, Sequence

import numpy as np
import jax


def epoch_batches(
    n_items: int,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 1338,
    drop_last: bool = True,
    process_index: int = 0,
    process_count: int = 1,
) -> Iterator[np.ndarray]:
    """Yield index batches, reshuffled each pass (DataLoader shuffle=True).

    Multi-host: every process draws the SAME shuffled order (seeded rng) and
    takes its interleaved slice, so the union of per-host batches is the
    global batch — `batch_size` here is the PER-HOST batch.
    """
    rng = np.random.default_rng(seed)
    while True:
        order = np.arange(n_items)
        if shuffle:
            rng.shuffle(order)
        if process_count > 1:
            order = order[process_index::process_count]
        n = len(order)
        stop = n - (n % batch_size if drop_last else 0)
        for i in range(0, stop, batch_size):
            yield order[i : i + batch_size]


class PrefetchIterator:
    """Iterate a map-style dataset as device-resident stacked batches.

    `collate` receives the list of dataset items for a batch and must return
    a pytree of numpy arrays (non-array leaves like names are passed through
    host-side, unstaged). `prefetch` batches are decoded ahead and staged to
    device asynchronously.

    `sharding` may be a Sharding (applied to every array leaf) or a callable
    `leaf -> Sharding` (per-leaf, e.g. rank-dependent batch shardings). On a
    multi-process runtime the staged leaf is assembled with
    `jax.make_array_from_process_local_data`, so each host stages only its
    local shard of the global batch.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        collate: Callable[[list[Any]], Any],
        sharding=None,
        shuffle: bool = True,
        seed: int = 1338,
        num_workers: int = 4,
        prefetch: int = 2,
        max_batches: int | None = None,
        shard_by_process: bool = False,
    ):
        self._dataset = dataset
        self._collate = collate
        self._sharding = sharding
        self._pool = ThreadPoolExecutor(max_workers=num_workers)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._index_iter = epoch_batches(
            len(dataset), batch_size, shuffle=shuffle, seed=seed,
            process_index=jax.process_index() if shard_by_process else 0,
            process_count=jax.process_count() if shard_by_process else 1,
        )
        self._max_batches = max_batches
        self._produced = 0
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._feeder.start()

    def _load_batch(self, idxs: np.ndarray):
        items = list(self._pool.map(self._dataset.__getitem__, idxs))
        batch = self._collate(items)
        return self._stage(batch)

    def _stage(self, batch):
        def put(leaf):
            if isinstance(leaf, np.ndarray) and leaf.dtype != object:
                s = self._sharding
                if callable(s):
                    s = s(leaf)
                if s is not None:
                    if jax.process_count() > 1:
                        return jax.make_array_from_process_local_data(s, leaf)
                    return jax.device_put(leaf, s)
                return jax.device_put(leaf)
            return leaf

        return jax.tree.map(put, batch)

    def _feed(self):
        try:
            for idxs in self._index_iter:
                if self._stop.is_set():
                    return
                if (
                    self._max_batches is not None
                    and self._produced >= self._max_batches
                ):
                    self._q.put(_SENTINEL)
                    return
                self._q.put(self._load_batch(idxs))
                self._produced += 1
        except Exception as e:  # surface decode errors to the consumer
            self._q.put(_ExcHolder(e))

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            raise StopIteration
        if isinstance(item, _ExcHolder):
            raise item.exc
        return item

    def close(self):
        self._stop.set()
        # Drain so the feeder thread can exit a blocking put.
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._pool.shutdown(wait=False)


_SENTINEL = object()


class _ExcHolder:
    def __init__(self, exc):
        self.exc = exc


def stack_collate(keys: Sequence[int]):
    """Collate tuples of per-item arrays by stacking positionally.

    `keys` lists tuple positions to stack into batched arrays; remaining
    positions are collected into lists (e.g. name strings).
    """

    def collate(items: list[tuple]):
        n = len(items[0])
        out = []
        for pos in range(n):
            vals = [it[pos] for it in items]
            if pos in keys:
                out.append(np.stack(vals))
            else:
                out.append(vals)
        return tuple(out)

    return collate
