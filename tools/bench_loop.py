"""End-to-end training-LOOP and eval throughput (VERDICT r2 #6, r4 next #1).

The per-step device time (bench.py train_step) excludes host work: the
mapper/augmentation pipeline on this 1-core host, batch assembly, dispatch
RTT over the device tunnel, and metric fetches. This runs a real fine-tune
through the public API on a synthetic COCO dataset and reports LOOP img/s
(wall clock over N iterations) next to the device step img/s, plus
``inference_on_dataset`` eval img/s for detection and semseg.

Emission contract (the caller may kill this process at any moment):
- a full JSON line is printed to stdout after EVERY completed row, last line
  wins at the parser;
- the train loop additionally emits a *running* loop_ips line every few
  steady-state iterations, so even a kill mid-training leaves a measured
  train row behind (r3 lost the loop to rc=124, r4 to the bench deadline —
  both produced zero rows because emission only happened at the very end);
- ``--budget S`` sets a soft deadline: rows that don't fit are skipped with
  a note instead of being killed mid-compile.

Usage: python tools/bench_loop.py [train|eval|all] [--iters N] [--bs N]
                                  [--res N] [--k N] [--budget S]
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

T0 = time.monotonic()


def bench_train_loop(iters: int, bs: int, res: int, steps_per_call: int, on_mark=None,
                     out=None, share=None, n_val: int = 8):
    from make_synthetic_dataset import make

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, Task, TrainerArgs

    tmp = tempfile.mkdtemp(prefix="benchloop_")
    # enough distinct images that the mapper actually works per iteration;
    # smaller set at small res — dataset gen is pre-first-row setup cost and
    # the first measured row must land before a tight slice expires
    n_train = 32 if res <= 320 else 64
    d = make(os.path.join(tmp, "det"), n_train=n_train, n_val=n_val, size=max(res, 320))
    auto = AutoDataset(d, Task.DETECTION, "roboflow_coco")
    tr_augs, va_augs = get_default_by_task(Task.DETECTION, resolution=res)
    train_ds = auto.get_split(tr_augs, DatasetSplitType.TRAIN)
    val_ds = auto.get_split(va_augs, DatasetSplitType.VAL)

    model = ModelManager.get("fai-detr-m-coco", num_classes=train_ds.metadata.num_classes,
                             classes=train_ds.metadata.classes, image_size=res, dtype="bfloat16")
    if share is not None:
        # hand the built model + mapped val split to the eval phase: the
        # detection eval row is the SAME family/res, so it can skip its own
        # dataset gen + ModelManager.get (~15-20 s) — the difference between
        # landing and budget-skipping the first eval row on a slow-tunnel day
        share["model"], share["val_ds"], share["res"] = model, val_ds, res
    warm = 3  # first dispatches compile; exclude from the timed window
    args = TrainerArgs(
        run_name="benchloop", output_dir=tmp, max_iters=iters + warm, batch_size=bs,
        eval_period=0, log_period=10_000, checkpointer_period=10_000, early_stop=False,
        workers=2, steps_per_call=steps_per_call, amp_enabled=True,
    )

    # time the loop body by hooking the trainer's run_step via the public
    # hook API: record wall time at iteration boundaries
    from focoos_tpu.trainer import hooks as hooks_mod

    marks = []
    out = {} if out is None else out  # shared with the caller's emit closure
    out.update(steps_per_call=steps_per_call, batch_size=bs, res=res)

    def steady_rate():
        steady = [(it, t) for it, t in marks if it >= warm]
        if len(steady) < 2:
            return None
        # median per-iter delta, not endpoints: stragglers (a checkpoint save
        # or late recompile inside one iteration) would otherwise drag the
        # whole-window mean far below the actual steady rate (measured: 302
        # ms/iter steady → 1366 ms/iter endpoint-mean with one slow tail iter)
        import numpy as _np

        deltas = [(t1 - t0) / max(1, i1 - i0)
                  for (i0, t0), (i1, t1) in zip(steady, steady[1:])]
        med = float(_np.median(deltas))
        return (bs / med, med * 1000, steady[-1][0] - steady[0][0])

    class _Mark(hooks_mod.HookBase):
        def after_step(self):
            marks.append((self.trainer.iter, time.perf_counter()))
            # running emission: a kill at any point past warm+2 still leaves
            # a measured (if short-window) loop row on stdout
            if on_mark is not None and len(marks) % 3 == 0:
                r = steady_rate()
                if r is not None:
                    out.update(loop_ips=round(r[0], 2), loop_ms_per_iter=round(r[1], 2),
                               iters_measured=r[2], partial=True)
                    on_mark()

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

    r = steady_rate()
    if r is not None:
        out.update(loop_ips=round(r[0], 2), loop_ms_per_iter=round(r[1], 2),
                   iters_measured=r[2], wall_total_s=round(total, 1))
        out.pop("partial", None)
    else:
        out.update(loop_ips=0.0, loop_ms_per_iter=None, wall_total_s=round(total, 1))
    print("train_loop:", json.dumps(out), file=sys.stderr, flush=True)
    return out


def bench_eval(res: int, n_images: int = 64, batch_size: int = 8, on_row=None, out=None,
               remaining=None, share=None):
    from make_synthetic_dataset import make, make_semseg

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.data.default_aug import get_default_by_task
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.ports import DatasetSplitType, Task
    from focoos_tpu.trainer.evaluation import evaluate_dataset

    out = {} if out is None else out
    tmp = tempfile.mkdtemp(prefix="benchev_")
    # budget gate: one eval row costs ~1 model compile (10s warm / 60-115s
    # cold over the tunnel) + the measured loop; calibrated from the first row
    row_cost = 75.0

    for tag, task, layout, maker, name, kwargs in (
        ("detection", Task.DETECTION, "roboflow_coco", make, "fai-detr-m-coco", {}),
        ("semseg", Task.SEMSEG, "roboflow_seg", make_semseg, "bisenetformer-s-ade", {}),
        ("instseg", Task.INSTANCE_SEGMENTATION, "roboflow_coco", make, "fai-mf-s-coco-ins", {}),
    ):
        shared = (tag == "detection" and share is not None and share.get("model") is not None
                  and share.get("res") == res)
        est = 35.0 if shared else row_cost  # reuse skips dataset gen + model build
        if remaining is not None and remaining() < est * 0.8:
            out[tag] = {"skipped": f"budget: {remaining():.0f}s left"}
            if on_row is not None:
                on_row()
            continue
        t_row = time.monotonic()
        if shared:
            model, val_ds = share["model"], share["val_ds"]
        else:
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
        if not shared:  # a reused row's cost is not representative of the rest
            row_cost = 0.5 * row_cost + 0.5 * (time.monotonic() - t_row)
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
    budget = arg("--budget", 0)

    def remaining():
        return (budget - (time.monotonic() - T0)) if budget > 0 else 1e9

    # adaptive sizing under a tight budget: the @640 trainer program costs
    # ~3-4 min to compile+upload over the device tunnel even with a warm
    # persistent cache (executable transfer dominates); a small-res row that
    # LANDS beats a 640 row that dies mid-compile. The row self-describes
    # (res/batch_size fields), so cross-round comparison stays honest.
    n_images = 64
    if 0 < budget < 240:
        res, iters, n_images = min(res, 320), min(iters, 10), 24
        print(f"budget {budget}s: shrunk to res={res} iters={iters}", file=sys.stderr, flush=True)

    # incremental emission: one full-JSON stdout line after every row (and a
    # running line every few train iterations), so a caller that kills this
    # subprocess at a deadline still parses the last line (same last-line-wins
    # contract as bench.py)
    results = {}

    def emit():
        print(json.dumps(results), flush=True)

    share = {} if which == "all" else None  # train → detection-eval model/dataset reuse
    if which in ("train", "all"):
        results["train_loop"] = {}
        bench_train_loop(iters, bs, res, k, on_mark=emit, out=results["train_loop"],
                         share=share, n_val=n_images if share is not None else 8)
        emit()
    if which in ("eval", "all"):
        results["eval"] = {}  # filled row-by-row (shared dict) so each emit sees it
        bench_eval(res, n_images=n_images, out=results["eval"], on_row=emit,
                   remaining=remaining, share=share)
    emit()
    os._exit(0)


if __name__ == "__main__":
    main()
