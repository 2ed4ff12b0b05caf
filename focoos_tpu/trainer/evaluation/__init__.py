"""Evaluation loop + evaluators (reference: focoos/trainer/evaluation/)."""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from focoos_tpu.ports import DatasetEntry
from focoos_tpu.trainer.evaluation.evaluators import (
    ClassificationEvaluator,
    DatasetEvaluator,
    DatasetEvaluators,
    DetectionEvaluator,
    InstanceSegmentationEvaluator,
    KeypointEvaluator,
    PanopticEvaluator,
    SemSegEvaluator,
    get_evaluator,
)
from focoos_tpu.utils.logger import get_logger, log_every_n_seconds

logger = get_logger(__name__)

__all__ = [
    "DatasetEvaluator",
    "DatasetEvaluators",
    "DetectionEvaluator",
    "InstanceSegmentationEvaluator",
    "KeypointEvaluator",
    "PanopticEvaluator",
    "SemSegEvaluator",
    "ClassificationEvaluator",
    "get_evaluator",
    "inference_on_dataset",
    "print_csv_format",
    "evaluate_dataset",
]


def _shard_indices(n: int, rank: int, world: int) -> List[int]:
    """Exact contiguous partition of [0, n) across hosts
    (reference: data/samplers.py InferenceSampler — every index exactly once)."""
    per = n // world
    rem = n % world
    begin = rank * per + min(rank, rem)
    end = begin + per + (1 if rank < rem else 0)
    return list(range(begin, end))


def inference_on_dataset(model, dataset, evaluator: DatasetEvaluator, batch_size: int = 8) -> Dict:
    """Batched eval loop with data/compute timing
    (reference: trainer/evaluation/evaluator.py:115-236).

    Multi-host: each host evaluates its InferenceSampler shard, then evaluator
    states are merged via all_gather_objects before ``evaluate()`` — the
    analog of the reference's comm.all_gather in sem_seg_evaluation.py /
    comm.py:139. Host preprocessing overlaps device compute through a
    depth-2 background prefetcher.
    """
    import queue
    import threading

    import jax

    from focoos_tpu.parallel.mesh import all_gather_objects, get_rank, get_world_size

    evaluator.reset()
    rank, world = get_rank(), get_world_size()
    indices = _shard_indices(len(dataset), rank, world)
    n = len(indices)
    total_compute, total_data = 0.0, 0.0
    start = time.perf_counter()

    def batches():
        i = 0
        while i < n:
            t0 = time.perf_counter()
            entries: List[DatasetEntry] = [dataset[indices[j]] for j in range(i, min(i + batch_size, n))]
            # pad the last batch to a static shape (avoids a fresh XLA compile)
            pad = batch_size - len(entries)
            batch_entries = entries + [entries[-1]] * pad
            batch, _ = model.processor.preprocess(batch_entries)
            # upload here, in the producer thread: the H2D copy of batch k+1
            # overlaps the device forward of batch k
            batch = jax.device_put(batch)
            yield entries, batch_entries, batch, time.perf_counter() - t0
            i += len(entries)

    # depth-2 prefetch: host preprocess of batch k+1 overlaps device compute of k
    q: "queue.Queue" = queue.Queue(maxsize=2)
    _SENTINEL = object()
    producer_error: List[BaseException] = []

    def producer():
        try:
            for item in batches():
                q.put(item)
        except BaseException as e:  # re-raised on the consumer side
            producer_error.append(e)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=producer, daemon=True)
    t.start()

    done = 0
    pending = None  # (entries, batch_entries, dispatched forward output)

    def consume(p) -> None:
        """Fetch + postprocess a previously dispatched batch (device already
        moved on to the next forward, so the transfer overlaps compute)."""
        nonlocal total_compute, done
        entries, batch_entries, out = p
        t1 = time.perf_counter()
        out = jax.block_until_ready(out)
        results = model.processor.eval_postprocess(out, batch_entries)
        total_compute += time.perf_counter() - t1
        evaluator.process(entries, results[: len(entries)])
        done += len(entries)
        log_every_n_seconds(logger, f"eval {done}/{n} images (host {rank}/{world})", n=10)

    while True:
        item = q.get()
        if item is _SENTINEL:
            if producer_error:
                raise producer_error[0]
            break
        entries, batch_entries, batch, data_time = item
        total_data += data_time
        # software pipeline: dispatch batch k's forward, THEN drain batch k-1
        out = model.forward(batch)
        prev, pending = pending, (entries, batch_entries, out)
        if prev is not None:
            consume(prev)
    if pending is not None:
        consume(pending)

    if world > 1:
        states = all_gather_objects(evaluator.state_for_gather())
        evaluator.load_gathered_states(states)

    results = evaluator.evaluate()
    logger.info(
        f"Evaluated {n} images in {time.perf_counter() - start:.1f}s "
        f"(compute {total_compute:.1f}s, data {total_data:.1f}s)"
    )
    return results


def evaluate_dataset(model, dataset, batch_size: int = 8, evaluator: Optional[DatasetEvaluator] = None) -> Dict:
    """Build the task evaluator for ``model`` and run inference_on_dataset."""
    if evaluator is None:
        evaluator = get_evaluator(model.task, len(model.classes), model.classes)
    return inference_on_dataset(model, dataset, evaluator, batch_size=batch_size)


def print_csv_format(results: Dict) -> None:
    """Log evaluator results as copy-pasteable task,metric,value lines
    (reference: trainer/evaluation/utils.py:9)."""
    for task in sorted(results):
        res = results[task]
        if not isinstance(res, dict):
            logger.info(f"{task}: {res}")
            continue
        important = {k: v for k, v in res.items() if "-" not in k}
        logger.info(f"copypaste: Task: {task}")
        logger.info("copypaste: " + ",".join(important.keys()))
        logger.info("copypaste: " + ",".join(f"{v:.4f}" if isinstance(v, float) else str(v) for v in important.values()))
