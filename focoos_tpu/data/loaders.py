"""Data loaders (reference: focoos/data/loaders.py).

Two prefetcher backends feed the trainer's batch queue:

- ``_ProcessPrefetcher`` (default for ``workers>=2``): real worker processes,
  the analog of torch DataLoader workers (reference loaders.py:94-132 +
  datasets/serialize.py:11). The mapper's Python-heavy work (PIL-antialiased
  resize ~9 ms/img, COCO ann decoding) runs GIL-free across cores; only
  (seq, index) tasks and mapped entries cross the pipe. Batches are collated
  in the parent (one contiguous stack) and device_put by the trainer.
- ``_Prefetcher`` (threads): fallback for ``workers<=1``, non-fork platforms,
  or ``FOCOOS_WORKER_PROCESSES=0``; fine when the mapper is cv2-bound
  (GIL-releasing) but GIL-bound for the PIL parity path.

The infinite ``TrainingSampler`` shuffle stream is sharded per host
(jax.process_index) like the reference's rank sharding (loaders.py:61-65)."""

from __future__ import annotations

import multiprocessing as mp
import os
import queue
import threading
import traceback
from typing import Iterator, List

import numpy as np

import jax

from focoos_tpu.ports import DatasetEntry
from focoos_tpu.utils.logger import get_logger

logger = get_logger(__name__)


class TrainingSampler:
    """Infinite shuffled index stream, sharded across hosts
    (reference: data/samplers.py:10)."""

    def __init__(self, size: int, shuffle: bool = True, seed: int = 0):
        self._size = size
        self._shuffle = shuffle
        self._seed = seed
        self._shard = jax.process_index()
        self._num_shards = jax.process_count()

    def __iter__(self) -> Iterator[int]:
        g = np.random.default_rng(self._seed)
        while True:
            order = g.permutation(self._size) if self._shuffle else np.arange(self._size)
            yield from order[self._shard :: self._num_shards].tolist()


class InferenceSampler:
    """Exact one-epoch partition across hosts (reference: data/samplers.py:67)."""

    def __init__(self, size: int):
        shard = jax.process_index()
        num = jax.process_count()
        self._indices = list(range(size))[shard::num]

    def __iter__(self):
        return iter(self._indices)

    def __len__(self):
        return len(self._indices)


#: queue sentinel: the sampler is exhausted and every batch has been emitted.
#: Only crosses in-process thread queues (never a worker pipe). Finite
#: samplers therefore end the iterator cleanly (torch DataLoader one-epoch
#: semantics, trailing partial batch included) instead of leaking a
#: StopIteration out of the producer thread and hanging the consumer.
_END_OF_STREAM = object()


class _Prefetcher:
    """Thread-pool mapper executor feeding an ordered batch queue.

    ``aspect_ratio_grouping`` buckets entries into wide (w>h) vs tall batches
    (reference: AspectRatioGroupedDataset, data/loaders.py:70) so batch padding
    in ``ImageList.from_tensors`` wastes less — only relevant for augmentation
    pipelines that emit variable shapes; square-resize pipelines see no change.
    """

    def __init__(self, dataset, sampler, batch_size: int, num_workers: int, collate,
                 aspect_ratio_grouping: bool = False):
        self._dataset = dataset
        self._sampler_iter = iter(sampler)
        self._batch_size = batch_size
        self._collate = collate
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        self._workers = max(1, num_workers)
        self._threads: List[threading.Thread] = []
        self._started = False
        self._ar_grouping = aspect_ratio_grouping

    @staticmethod
    def _entry_is_wide(entry) -> bool:
        w = getattr(entry, "width", None)
        h = getattr(entry, "height", None)
        if (w is None or h is None) and getattr(entry, "image", None) is not None:
            h, w = entry.image.shape[:2]
        return bool(w and h and w > h)

    def _producer(self):
        from concurrent.futures import ThreadPoolExecutor

        buckets: List[list] = [[], []]
        with ThreadPoolExecutor(max_workers=self._workers) as pool:
            while True:
                if getattr(self, "_closed", False):
                    return
                idxs: List[int] = []
                exhausted = False
                for _ in range(self._batch_size):
                    try:
                        idxs.append(next(self._sampler_iter))
                    except StopIteration:  # finite sampler: end the stream
                        exhausted = True
                        break
                entries = list(pool.map(self._dataset.__getitem__, idxs)) if idxs else []
                if not self._ar_grouping:
                    if entries:
                        self._q.put(self._collate(entries))
                else:
                    for e in entries:
                        b = buckets[0] if self._entry_is_wide(e) else buckets[1]
                        b.append(e)
                        if len(b) == self._batch_size:
                            self._q.put(self._collate(b[:]))
                            b.clear()
                if exhausted:
                    for b in buckets:  # trailing partial ar-group batches
                        if b:
                            self._q.put(self._collate(b[:]))
                            b.clear()
                    self._q.put(_END_OF_STREAM)
                    return

    def close(self):
        """Stop the producer: set the flag, then drain the queue so a
        producer blocked in q.put wakes up, sees the flag, and exits."""
        self._closed = True
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass

    def __iter__(self):
        if not self._started:
            t = threading.Thread(target=self._producer, daemon=True)
            t.start()
            self._threads.append(t)
            self._started = True
        while True:
            item = self._q.get()
            if item is _END_OF_STREAM:
                return
            yield item


class _WorkerFailure:
    """Exception transported across the worker pipe."""

    def __init__(self, exc: BaseException):
        self.message = f"{type(exc).__name__}: {exc}\n{traceback.format_exc()}"


def _worker_loop(dataset, task_q, result_q, seed: int):
    """Worker-process body: map sampler indices through the dataset.

    Runs ``dataset[idx]`` (MapDataset applies the augmentation mapper) and
    ships the mapped entry back. Never touches JAX — fork-safe.

    Parent-death watchdog: daemon processes are reaped by multiprocessing's
    atexit handler, which ``os._exit`` BYPASSES (and our CLI/smoke scripts
    use os._exit to dodge prefetch-thread teardown hangs) — so workers poll
    getppid() and exit when orphaned instead of leaking GBs forever."""
    np.random.seed(seed)  # distinct augmentation streams per worker
    import random as _random

    _random.seed(seed)
    parent = os.getppid()
    while True:
        try:
            item = task_q.get(timeout=5.0)
        except queue.Empty:
            if os.getppid() != parent:  # reparented: parent is gone
                return
            continue
        if item is None:
            return
        seq, idx = item
        try:
            result_q.put((seq, dataset[idx]))
        except BaseException as e:  # surfaced in the parent
            result_q.put((seq, _WorkerFailure(e)))


class _ProcessPrefetcher:
    """Worker-process mapper executor feeding an ordered batch queue
    (reference: torch DataLoader workers, focoos/data/loaders.py:94-132).

    Per-sample (seq, idx) tasks fan out to N forked workers; results are
    reordered by seq so the entry stream is deterministic (identical to the
    thread backend and to ``workers=0``). Collation runs in the parent —
    one contiguous numpy stack per batch, no large pickles on the task path.
    """

    def __init__(self, dataset, sampler, batch_size: int, num_workers: int, collate,
                 aspect_ratio_grouping: bool = False, seed: int = 0,
                 start_method: str = "fork"):
        self._dataset = dataset
        self._sampler_iter = iter(sampler)
        self._batch_size = batch_size
        self._collate = collate
        self._q: "queue.Queue" = queue.Queue(maxsize=4)
        self._workers = max(1, num_workers)
        self._ar_grouping = aspect_ratio_grouping
        self._seed = seed
        self._start_method = start_method
        self._started = False
        self._closed = False
        self._procs: List[mp.Process] = []
        # set by the feeder when a FINITE sampler exhausts: total tasks fed.
        # The producer drains up to this seq, flushes partial batches, and
        # ends the stream (infinite TrainingSampler never sets it).
        self._fed_total: int | None = None

    def _start(self):
        ctx = mp.get_context(self._start_method)
        # in-flight bound: keeps ~4 batches of tasks queued without the feeder
        # racing ahead of consumption (memory bound on mapped entries)
        self._task_q = ctx.Queue(maxsize=4 * self._batch_size)
        # the result queue MUST be bounded too: with the batch queue full and
        # an infinite sampler, an unbounded result queue lets the workers map
        # forever after the consumer stops (training ended, eval phase began)
        # — 100% of the host cores + unbounded RAM, measured as a 10-25x
        # slowdown of the post-training eval in the same process
        self._result_q = ctx.Queue(maxsize=4 * self._batch_size)
        for w in range(self._workers):
            p = ctx.Process(
                target=_worker_loop,
                args=(self._dataset, self._task_q, self._result_q, self._seed * 1000 + w),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
        threading.Thread(target=self._feeder, daemon=True).start()
        threading.Thread(target=self._producer, daemon=True).start()
        self._started = True
        logger.info(f"data loader: {self._workers} worker processes ({self._start_method})")

    def _feeder(self):
        seq = 0
        while not self._closed:
            try:
                idx = next(self._sampler_iter)
            except StopIteration:  # finite sampler: hand off to the producer
                self._fed_total = seq
                return
            while not self._closed:
                try:
                    # bounded put, re-checked so close() can stop the feed
                    # (a plain blocking put would keep refilling the task
                    # queue and starve the shutdown sentinels)
                    self._task_q.put((seq, idx), timeout=0.2)
                    break
                except queue.Full:
                    continue
            seq += 1

    def _producer(self):
        reorder = {}
        next_seq = 0
        buckets: List[list] = [[], []]
        batch: List = []
        while True:
            if self._fed_total is not None and next_seq >= self._fed_total:
                # finite sampler done and every fed entry consumed: flush the
                # trailing partial batch(es), end the stream
                for b in (buckets if self._ar_grouping else [batch]):
                    if b:
                        self._q.put(self._collate(b[:]))
                        b.clear()
                self._q.put(_END_OF_STREAM)
                return
            try:
                seq, payload = self._result_q.get(timeout=0.2)
            except queue.Empty:
                if self._closed:
                    return
                continue
            reorder[seq] = payload
            while next_seq in reorder:
                entry = reorder.pop(next_seq)
                next_seq += 1
                if isinstance(entry, _WorkerFailure):
                    self._q.put(RuntimeError(f"data worker failed: {entry.message}"))
                    return
                if self._ar_grouping:
                    b = buckets[0] if _Prefetcher._entry_is_wide(entry) else buckets[1]
                    b.append(entry)
                    if len(b) == self._batch_size:
                        self._q.put(self._collate(b[:]))
                        b.clear()
                else:
                    batch.append(entry)
                    if len(batch) == self._batch_size:
                        self._q.put(self._collate(batch[:]))
                        batch.clear()

    def close(self):
        """Graceful stop, then terminate stragglers.

        Sentinels are offered first so a worker mid-``result_q.put`` finishes
        its put (an immediate terminate() can leave a partial pickle in the
        pipe); results are drained while waiting so blocked putters can
        complete. Workers still alive after the grace window are terminated.

        A closed prefetcher CANNOT be iterated again: the feeder/producer
        daemon threads exit on the closed flag (within their 0.2 s poll) and
        the queues are dead — build a new loader for a new epoch/run instead.
        """
        import time as _time

        self._closed = True
        pending = len(self._procs)  # one sentinel per worker, delivered as room frees
        deadline = _time.monotonic() + 2.0
        for p in self._procs:
            while p.is_alive() and _time.monotonic() < deadline:
                if pending:
                    try:
                        self._task_q.put_nowait(None)
                        pending -= 1
                    except Exception:
                        pass  # still full; drain below makes room
                try:  # drain so a worker blocked mid-put can finish and exit
                    self._result_q.get_nowait()
                except queue.Empty:
                    p.join(timeout=0.05)
        for p in self._procs:
            if p.is_alive():
                p.terminate()
        self._procs.clear()

    def __iter__(self):
        if self._closed:
            raise RuntimeError("prefetcher was closed; build a new loader")
        if not self._started:
            self._start()
        while True:
            item = self._q.get()
            if item is _END_OF_STREAM:
                self.close()  # workers are idle on task_q; reap them
                return
            if isinstance(item, BaseException):
                self.close()
                raise item
            yield item


def make_prefetcher(dataset, sampler, batch_size: int, num_workers: int, collate,
                    aspect_ratio_grouping: bool = False, seed: int = 0):
    """Pick the prefetcher backend (processes by default, like the reference's
    DataLoader ``workers=N``; threads when workers<=1 / no fork / opted out)."""
    env = os.environ.get("FOCOOS_WORKER_PROCESSES")
    start = os.environ.get("FOCOOS_WORKER_START", "fork")  # spawn = fork-safety paranoia
    use_procs = num_workers >= 2 and start in mp.get_all_start_methods()
    if env is not None:
        use_procs = env not in ("0", "false", "no", "thread", "threads") and num_workers >= 1
    if use_procs:
        return _ProcessPrefetcher(dataset, sampler, batch_size, num_workers, collate,
                                  aspect_ratio_grouping=aspect_ratio_grouping, seed=seed,
                                  start_method=start)
    return _Prefetcher(dataset, sampler, batch_size, num_workers, collate,
                       aspect_ratio_grouping=aspect_ratio_grouping)


def device_prefetch(it, depth: int = 2):
    """Run an iterator in a background thread, ``depth`` items ahead.

    Wrap a generator whose body performs the host→device placement
    (``device_put`` / ``shard_batch``): the upload of batch k+1 then overlaps
    the device computing step k instead of serializing in the train loop.
    On remote-attached devices the upload is the dominant host cost
    (~200 ms for a 20 MB uint8 b16@640 batch), so this is the difference
    between a transfer-bound and a compute-bound loop.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    _SENTINEL = object()
    err: List[BaseException] = []

    def run():
        try:
            for x in it:
                q.put(x)
        except BaseException as e:  # surfaced on the consumer side
            err.append(e)
        finally:
            q.put(_SENTINEL)

    threading.Thread(target=run, daemon=True).start()
    while True:
        x = q.get()
        if x is _SENTINEL:
            if err:
                raise err[0]
            return
        yield x


def build_train_loader(
    dataset,
    processor,
    total_batch_size: int,
    num_workers: int = 4,
    seed: int = 0,
    max_instances: int = 100,
    shuffle: bool = True,
    aspect_ratio_grouping: bool = False,
):
    """Infinite preprocessed-batch stream (reference: build_detection_train_loader
    loaders.py:94). Per-host batch = total / process_count."""
    per_host = total_batch_size // jax.process_count()
    assert per_host >= 1, "batch size smaller than host count"
    sampler = TrainingSampler(len(dataset), shuffle=shuffle, seed=seed)

    def collate(entries: List[DatasetEntry]):
        batch, targets = processor.preprocess_entries(entries, max_instances=max_instances)
        return batch, targets

    return make_prefetcher(dataset, sampler, per_host, num_workers, collate,
                           aspect_ratio_grouping=aspect_ratio_grouping, seed=seed)


def build_test_loader(dataset, batch_size: int = 8):
    """One-epoch list-of-entries batches (reference: build_detection_test_loader
    loaders.py:135)."""
    sampler = InferenceSampler(len(dataset))

    def gen():
        batch = []
        for i in sampler:
            batch.append(dataset[i])
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    return gen()


def trivial_batch_collator(entries: List[DatasetEntry]) -> List[DatasetEntry]:
    """(reference: datasets/common.py:46)"""
    return entries
