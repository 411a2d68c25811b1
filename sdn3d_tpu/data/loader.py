"""Host-side data loader: worker threads + bounded prefetch + device_put.

TPU-native re-expression of the reference's forked DataLoader
(semantic/lib/utils/data/dataloader.py:34-100: worker processes feeding an
index queue, pin-memory thread) and the async H2D side-stream copies
(semantic/lib/nn/parallel/data_parallel.py:202-246): here worker THREADS
decode/augment (numpy releases the GIL; the native host library does the
pixel work), a bounded queue gives prefetch, and `jax.device_put` with an
optional NamedSharding plays the pin-memory+H2D role — transfers overlap
with device compute because device_put is async.

Also covers derender3d/data_loader.py:17-40 (zero-fill collate across
heterogeneous hybrid batches) and the WeightedRandomSampler used for
kitti-full (data_loader.py:43-82).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


def zero_fill_collate(items: Sequence[Dict[str, np.ndarray]]
                      ) -> Dict[str, np.ndarray]:
    """Stack dict items; keys missing from an item are zero-filled with the
    shape/dtype of a present value (derender3d/data_loader.py:17-40 —
    hybrid datasets yield different key sets per source)."""
    keys = {}
    for it in items:
        for k, v in it.items():
            if k not in keys:
                keys[k] = np.asarray(v)
    out = {}
    for k, proto in keys.items():
        rows = [np.asarray(it[k]) if k in it
                else np.zeros_like(proto) for it in items]
        out[k] = np.stack(rows)
    return out


class HybridDataset:
    """Weighted concat of datasets (derender3d/datasets.py:175-190):
    indexable like one dataset; get_weights() yields the per-item
    WeightedRandomSampler weights (weight_ds / len_ds per item)."""

    def __init__(self, datasets, weights=None):
        self.datasets = list(datasets)
        self.weights = list(weights) if weights is not None \
            else [1.0] * len(self.datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, index: int):
        i = int(np.searchsorted(self._offsets, index, side="right") - 1)
        return self.datasets[i][int(index - self._offsets[i])]

    def get_weights(self) -> np.ndarray:
        from sdn3d_tpu.data.kitti import hybrid_weights
        return hybrid_weights([len(d) for d in self.datasets],
                              self.weights)


class WeightedSampler:
    """Infinite with-replacement weighted index stream
    (torch WeightedRandomSampler semantics)."""

    def __init__(self, weights: Sequence[float],
                 seed: int = 0):
        w = np.asarray(weights, np.float64)
        self._p = w / w.sum()
        self._rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[int]:
        n = len(self._p)
        while True:
            yield int(self._rng.choice(n, p=self._p))


class EpochSampler:
    """Shuffled (or sequential) single-epoch index stream."""

    def __init__(self, length: int, shuffle: bool = True, seed: int = 0):
        self.length = length
        self.shuffle = shuffle
        self._rng = np.random.RandomState(seed)

    def __iter__(self) -> Iterator[int]:
        idx = np.arange(self.length)
        if self.shuffle:
            self._rng.shuffle(idx)
        return iter(int(i) for i in idx)


class PrefetchLoader:
    """Threaded batch loader with bounded prefetch.

    dataset: indexable returning dict[str, np.ndarray];
    sampler: iterable of indices (finite = one epoch, infinite = stream);
    sharding: optional jax.sharding.NamedSharding — batches are device_put
    with it (async H2D), otherwise host numpy batches are yielded.
    """

    def __init__(self, dataset, batch_size: int, sampler=None,
                 num_workers: int = 4, prefetch: int = 2,
                 collate: Callable = zero_fill_collate,
                 sharding=None, drop_last: bool = True,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate = collate
        self.sharding = sharding
        self.drop_last = drop_last
        self.shuffle = shuffle
        self.seed = seed
        self._epoch = 0                   # per-__iter__ reshuffle salt

    def _batches_of_indices(self, sampler):
        buf = []
        for i in sampler:
            buf.append(i)
            if len(buf) == self.batch_size:
                yield list(buf)
                buf.clear()
        if buf and not self.drop_last:
            yield list(buf)

    def __iter__(self):
        # a fresh default sampler per epoch, salted so epochs reshuffle
        # (torch DataLoader semantics); explicit samplers own their state
        epoch = self._epoch
        self._epoch += 1
        sampler = self.sampler if self.sampler is not None else \
            EpochSampler(len(self.dataset), self.shuffle,
                         self.seed + epoch)

        # Bounded IN-FLIGHT pipeline: `budget` caps the total number of
        # batches anywhere between the feeder and the consumer (queued +
        # decoding + decoded-but-unordered + ready), so an infinite
        # sampler streams lazily and decoded batches cannot pile up in
        # host memory beyond prefetch + num_workers.
        budget = threading.Semaphore(self.prefetch + self.num_workers)
        idx_q: "queue.Queue" = queue.Queue()
        out_q: "queue.Queue" = queue.Queue()
        DONE = object()
        lock = threading.Lock()
        cond = threading.Condition(lock)
        results: Dict[int, tuple] = {}
        state = {"fed": 0, "done_feeding": False}
        stop = threading.Event()   # consumer abandoned the iterator

        def feeder():
            j = 0
            for idxs in self._batches_of_indices(sampler):
                budget.acquire()
                if stop.is_set():
                    break
                idx_q.put((j, idxs))
                j += 1
                with lock:
                    state["fed"] = j
            with lock:
                state["done_feeding"] = True
                cond.notify_all()
            for _ in range(self.num_workers):
                idx_q.put(DONE)

        def worker():
            while True:
                item = idx_q.get()
                if item is DONE:
                    return
                j, idxs = item
                try:
                    payload = ("ok", self.collate(
                        [self.dataset[i] for i in idxs]))
                except BaseException as e:   # propagate, don't deadlock
                    payload = ("err", e)
                with lock:
                    results[j] = payload
                    cond.notify_all()

        def orderer():
            j = 0
            while True:
                with lock:
                    while j not in results and not (
                            state["done_feeding"]
                            and j >= state["fed"]):
                        cond.wait()
                    if j not in results:
                        break
                    payload = results.pop(j)
                out_q.put(payload)
                j += 1
            out_q.put(("done", None))

        threads = [threading.Thread(target=fn, daemon=True)
                   for fn in [feeder] + [worker] * self.num_workers
                   + [orderer]]
        for t in threads:
            t.start()

        try:
            while True:
                kind, payload = out_q.get()
                if kind == "done":
                    return
                if kind == "err":
                    raise RuntimeError(
                        "PrefetchLoader worker failed") from payload
                budget.release()
                batch = payload
                if self.sharding is not None:
                    import jax
                    batch = jax.tree_util.tree_map(
                        lambda x: jax.device_put(x, self.sharding), batch)
                yield batch
        finally:
            # Shutdown on ANY exit — epoch end, consumer break/close
            # (GeneratorExit lands here), or the worker-error re-raise:
            # wake the feeder (one release is enough; it re-checks `stop`
            # on every trip), let workers drain to their DONE tokens, and
            # wake the orderer so no thread or in-flight batch outlives
            # the iteration.
            stop.set()
            budget.release()
            with lock:
                cond.notify_all()
            for t in threads:
                t.join(timeout=30.0)
