"""End-to-end training-LOOP and eval throughput (VERDICT r2 #6).

The per-step device time (bench.py train_step) excludes host work: the
mapper/augmentation pipeline on this 1-core host, batch assembly, dispatch
RTT over the device tunnel, and metric fetches. This runs a real fine-tune
through the public API on a synthetic COCO dataset and reports LOOP img/s
(wall clock over N iterations) next to the device step img/s, plus
``inference_on_dataset`` eval img/s for detection and semseg.

Usage: python tools/bench_loop.py [train|eval|all] [--iters N] [--bs N] [--res N] [--k N]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def bench_train_loop(iters: int, bs: int, res: int, steps_per_call: int):
    from make_synthetic_dataset import make

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, Task, TrainerArgs

    tmp = tempfile.mkdtemp(prefix="benchloop_")
    # enough distinct images that the mapper actually works per iteration
    d = make(os.path.join(tmp, "det"), n_train=64, n_val=8, size=max(res, 320))
    auto = AutoDataset(d, Task.DETECTION, "roboflow_coco")
    tr_augs, va_augs = get_default_by_task(Task.DETECTION, resolution=res)
    train_ds = auto.get_split(tr_augs, DatasetSplitType.TRAIN)
    val_ds = auto.get_split(va_augs, DatasetSplitType.VAL)

    model = ModelManager.get("fai-detr-m-coco", num_classes=train_ds.metadata.num_classes,
                             classes=train_ds.metadata.classes, image_size=res, dtype="bfloat16")
    warm = 8  # first dispatches compile; exclude from the timed window
    args = TrainerArgs(
        run_name="benchloop", output_dir=tmp, max_iters=iters + warm, batch_size=bs,
        eval_period=0, log_period=10_000, checkpointer_period=10_000, early_stop=False,
        workers=2, steps_per_call=steps_per_call, amp_enabled=True,
    )

    # time the loop body by hooking the trainer's run_step via the public
    # hook API: record wall time at iteration boundaries
    from focoos_tpu.trainer import hooks as hooks_mod

    marks = []

    class _Mark(hooks_mod.HookBase):
        def after_step(self):
            marks.append((self.trainer.iter, time.perf_counter()))

    import focoos_tpu.trainer.trainer as trainer_mod

    orig_build = trainer_mod.FocoosTrainer._register_hooks

    def patched(self, loop, checkpointer, schedule):
        orig_build(self, loop, checkpointer, schedule)
        loop.register_hooks([_Mark()])

    trainer_mod.FocoosTrainer._register_hooks = patched
    try:
        t0 = time.perf_counter()
        model.train(args, train_ds, val_ds)
        total = time.perf_counter() - t0
    finally:
        trainer_mod.FocoosTrainer._register_hooks = orig_build

    # steady-state window: drop the compile-heavy prefix
    steady = [(it, t) for it, t in marks if it >= warm]
    if len(steady) >= 2:
        (it0, ts0), (it1, ts1) = steady[0], steady[-1]
        n_imgs = (it1 - it0) * bs
        loop_s = ts1 - ts0
        ips = n_imgs / loop_s
    else:
        ips, loop_s, n_imgs = 0.0, total, 0
    out = {
        "loop_ips": round(ips, 2),
        "loop_ms_per_iter": round(loop_s / max(1, (steady[-1][0] - steady[0][0])) * 1000, 2) if len(steady) >= 2 else None,
        "steps_per_call": steps_per_call,
        "batch_size": bs,
        "res": res,
        "wall_total_s": round(total, 1),
    }
    print("train_loop:", json.dumps(out), file=sys.stderr, flush=True)
    return out


def bench_eval(res: int, n_images: int = 64, batch_size: int = 8, on_row=None, out=None):
    from make_synthetic_dataset import make, make_semseg

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, Task
    from focoos_tpu.trainer.evaluation import evaluate_dataset

    out = {} if out is None else out
    tmp = tempfile.mkdtemp(prefix="benchev_")

    for tag, task, layout, maker, name, kwargs in (
        ("detection", Task.DETECTION, "roboflow_coco", make, "fai-detr-m-coco", {}),
        ("semseg", Task.SEMSEG, "roboflow_seg", make_semseg, "bisenetformer-s-ade", {}),
        ("instseg", Task.INSTANCE_SEGMENTATION, "roboflow_coco", make, "fai-mf-s-coco-ins", {}),
    ):
        d = maker(os.path.join(tmp, tag), n_train=4, n_val=n_images, size=max(res, 320))
        auto = AutoDataset(d, task, layout)
        _, va_augs = get_default_by_task(task, resolution=res)
        val_ds = auto.get_split(va_augs, DatasetSplitType.VAL)
        model = ModelManager.get(name, num_classes=val_ds.metadata.num_classes,
                                 classes=val_ds.metadata.classes, image_size=res,
                                 dtype="bfloat16", **kwargs)
        # warm the compile outside the timed window
        evaluate_dataset(model, [val_ds[i] for i in range(min(batch_size, len(val_ds)))],
                         batch_size=batch_size)
        t0 = time.perf_counter()
        evaluate_dataset(model, val_ds, batch_size=batch_size)
        dt = time.perf_counter() - t0
        out[tag] = {"eval_ips": round(len(val_ds) / dt, 2), "n": len(val_ds),
                    "batch_size": batch_size, "res": res, "s": round(dt, 2)}
        print(f"eval {tag}:", json.dumps(out[tag]), file=sys.stderr, flush=True)
        if on_row is not None:
            on_row()
    return out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/focoos_tpu_xla"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    def arg(flag, default):
        return int(sys.argv[sys.argv.index(flag) + 1]) if flag in sys.argv else default

    iters = arg("--iters", 40)
    bs = arg("--bs", 16)
    res = arg("--res", 640)
    k = arg("--k", 1)

    # incremental emission: one full-JSON stdout line after every row, so a
    # caller that kills this subprocess at a deadline still parses the last
    # line (same last-line-wins contract as bench.py)
    results = {}
    if which in ("train", "all"):
        results["train_loop"] = bench_train_loop(iters, bs, res, k)
        print(json.dumps(results), flush=True)
    if which in ("eval", "all"):
        results["eval"] = {}  # filled row-by-row (shared dict) so each emit sees it
        bench_eval(res, out=results["eval"],
                   on_row=lambda: print(json.dumps(results), flush=True))
    print(json.dumps(results))
    os._exit(0)


if __name__ == "__main__":
    main()
