"""Mapper-throughput scaling benchmark: thread vs process workers.

Measures build_train_loader batches/s on a synthetic detection dataset with
the default (reference-exact, PIL-antialiased) resize — the GIL-bound mapper
path that motivated process workers (VERDICT r3 weak #2 / next #3).

Run: python tools/bench_workers.py [--size 640] [--batches 12] [--bs 8]
"""

import argparse
import os
import sys
import tempfile
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure(dataset_dir, workers, use_processes, batch_size, n_batches, res):
    os.environ["FOCOOS_WORKER_PROCESSES"] = "1" if use_processes else "0"
    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.data.loaders import build_train_loader
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, Task

    auto = AutoDataset(dataset_dir, Task.DETECTION, "roboflow_coco")
    tr_augs, _ = get_default_by_task(Task.DETECTION, resolution=res)
    train_ds = auto.get_split(tr_augs, DatasetSplitType.TRAIN)
    model = ModelManager.get(
        "fai-detr-m-coco", num_classes=train_ds.metadata.num_classes,
        classes=train_ds.metadata.classes, image_size=res,
        num_queries=10, transformer_predictor_dec_layers=2,
    )
    loader = build_train_loader(train_ds, processor=model.processor,
                                total_batch_size=batch_size, num_workers=workers)
    it = iter(loader)
    next(it)  # warm the pipeline (worker start, first fills)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        next(it)
    dt = time.perf_counter() - t0
    if hasattr(loader, "close"):
        loader.close()
    return n_batches * batch_size / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024, help="source image size (resized to --res)")
    ap.add_argument("--res", type=int, default=640)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--batches", type=int, default=12)
    ns = ap.parse_args()

    from make_synthetic_dataset import make

    tmp = tempfile.mkdtemp(prefix="bench_workers_")
    d = make(os.path.join(tmp, "det"), n_train=64, n_val=4, size=ns.size)

    print(f"mapper throughput, PIL resize {ns.size}->{ns.res}, batch {ns.bs} "
          f"({os.cpu_count()} cores):")
    base = None
    for backend, use_procs, workers in [
        ("thread", False, 1), ("thread", False, 4),
        ("process", True, 1), ("process", True, 2), ("process", True, 4),
        ("process", True, 8),
    ]:
        ips = measure(d, workers, use_procs, ns.bs, ns.batches, ns.res)
        if base is None:
            base = ips
        print(f"  {backend:8s} workers={workers}: {ips:7.1f} img/s  ({ips / base:.2f}x)")
    os._exit(0)


if __name__ == "__main__":
    main()
