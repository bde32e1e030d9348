"""Host data pipeline: batching, shuffling, threaded prefetch, device put.

Replaces the reference's torch DataLoader + worker processes
(/root/reference/src/main.py:98-122) with a thread-pool loader feeding a
double-buffered device prefetch queue: item building (cv2 warp + numpy target
scatter) overlaps with device compute, and batches land pre-sharded on the
mesh so the train step never waits on H2D copies.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def stack_items(items) -> Dict[str, np.ndarray]:
    """Stack a list of item dicts into batched arrays (recursive)."""
    out = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], dict):
            out[key] = stack_items(vals)
        else:
            out[key] = np.stack([np.asarray(v) for v in vals], axis=0)
    return out


class Loader:
    """Iterable over batched items with optional shuffling and prefetch."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True, num_threads: int = 2,
                 prefetch: int = 2, drop_keys=("meta",),
                 augment: Optional[bool] = None, shard=None,
                 pad_to_batch: bool = False):
        """``augment`` controls training augmentation explicitly; it defaults
        to ``shuffle`` for backward compatibility but is independent — a
        SHUFFLE=False training run still augments (the reference couples
        augmentation to the split, not the sampler; generic_dataset.py).

        ``shard``: optional ``(shard_id, num_shards)`` — each multi-host
        process iterates a disjoint strided slice of the (identically
        shuffled) index stream, the reference's per-rank DistributedSampler
        arrangement (main.py:100,117); batch_size is the per-process size.

        ``pad_to_batch``: pad the index stream (after shard slicing) to a
        multiple of batch_size by repeating leading indices, so every batch
        is full-size. Used by sharded multi-process eval: equal, full batches
        on every process keep the SPMD step counts and shapes identical
        (duplicated images dedup downstream through the img_id-keyed results
        dict).
        """
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.augment = shuffle if augment is None else bool(augment)
        self.seed = seed
        self.drop_last = drop_last
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.drop_keys = set(drop_keys or ())
        self.shard = tuple(shard) if shard else None
        self.pad_to_batch = bool(pad_to_batch)
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset)
        if self.shard:
            # padded shards (see _indices) are all exactly ceil(n/ns) long
            n = -(-n // self.shard[1])
        if self.pad_to_batch:
            # the index stream is padded to a batch_size multiple, so every
            # batch exists and is full — drop_last must not discard the
            # padded final batch
            return -(-n // self.batch_size)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # same seed on every process: identical global order, disjoint
            # per-shard slices
            np.random.RandomState(self.seed + self.epoch).shuffle(idx)
        if self.shard:
            sid, ns = self.shard
            # pad to a multiple of num_shards by repeating leading indices
            # (torch DistributedSampler semantics): every shard gets the SAME
            # length, so every process yields the same batch count — unequal
            # counts deadlock the SPMD collectives on the extra step
            pad = (-len(idx)) % ns
            if pad:
                # np.resize tiles cyclically, so the pad is correct even when
                # pad > len(idx) (tiny dataset, many shards) — a single
                # idx[:pad] slice would under-pad and desync shard lengths
                idx = np.resize(idx, len(idx) + pad)
            idx = idx[sid::ns]
        if self.pad_to_batch and len(idx):
            pad = (-len(idx)) % self.batch_size
            if pad:
                idx = np.resize(idx, len(idx) + pad)
        return idx

    def _build(self, index: int, sample_seed: int):
        rng = (
            np.random.RandomState(sample_seed) if self.augment else None
        )
        item = self.dataset.get_item(index, rng)
        for k in self.drop_keys:
            item.pop(k, None)
        return item

    def peek(self) -> Dict[str, np.ndarray]:
        """First batch, built synchronously on the calling thread.

        For shape/pytree probes: ``next(iter(loader))`` with prefetch on
        abandons a live worker thread that keeps building batches nobody
        reads. ``peek`` spawns no threads and does not advance the epoch.
        """
        indices = self._indices()[: self.batch_size]
        assert len(indices), "empty dataset"
        base = (self.seed + self.epoch) * 1_000_003
        return stack_items([self._build(int(i), base + int(i))
                            for i in indices])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._indices()
        n_batches = len(self)
        base = (self.seed + self.epoch) * 1_000_003

        def chunk_items(pool, b):
            chunk = indices[b * self.batch_size : (b + 1) * self.batch_size]
            build = lambda i: self._build(int(i), base + int(i))
            # per-item seeds are index-derived, so thread completion order
            # cannot change the batch contents (pool.map preserves order)
            items = list(pool.map(build, chunk)) if pool else [
                build(i) for i in chunk
            ]
            return stack_items(items)

        def batches():
            if self.num_threads > 1:
                from concurrent.futures import ThreadPoolExecutor

                # item building is cv2/numpy-heavy (decode, warp, target
                # scatter — all GIL-releasing), so WORKERS threads parallelize
                # it on multi-core hosts, the reference's DataLoader-workers
                # arrangement (main.py:98-122) without process boundaries
                with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
                    for b in range(n_batches):
                        yield chunk_items(pool, b)
            else:
                for b in range(n_batches):
                    yield chunk_items(None, b)

        if self.prefetch > 0:
            yield from _prefetch_iter(batches(), self.prefetch)
        else:
            yield from batches()
        self.epoch += 1


def _prefetch_iter(it, depth: int):
    """Run the producer in a background thread with a bounded queue.

    Abandoning the consumer (``next(iter(loader))`` then dropping the
    iterator) must not leak the producer: the worker's puts poll a stop
    event, and the consumer's ``finally`` (run on GeneratorExit when the
    abandoned generator is collected) sets it. The worker then closes the
    underlying generator, which unwinds ``batches()``'s ``with
    ThreadPoolExecutor`` and releases its worker threads — without this, a
    blocked ``q.put`` would pin the pool's non-daemon threads for the rest
    of the process, one pool per abandoned epoch.
    """
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()
    err = []
    stop = threading.Event()

    def safe_put(x) -> bool:
        while not stop.is_set():
            try:
                q.put(x, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            try:
                for x in it:
                    if not safe_put(x):
                        break
            finally:
                # unwind batches()'s ThreadPoolExecutor context
                if hasattr(it, "close"):
                    it.close()
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        safe_put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            x = q.get()
            if x is _END:
                break
            yield x
        if err:
            raise err[0]
    finally:
        stop.set()


def device_prefetch(batch_iter, mesh=None, size: int = 2):
    """Move batches to device (sharded over the mesh) ahead of consumption."""
    import jax
    from ..parallel import shard_batch

    def put(batch):
        if mesh is not None:
            return shard_batch(batch, mesh)
        return jax.tree.map(jax.device_put, batch)

    buf = []
    it = iter(batch_iter)
    if size <= 0:  # degrade to unbuffered device placement
        for batch in it:
            yield put(batch)
        return
    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    for batch in it:
        out = buf.pop(0)
        buf.append(put(batch))
        yield out
    yield from buf
