"""Accuracy-parity harness: measured mAP/mIoU vs the registry card's val_metrics.

Reproduces the reference's real-dataset validation path
(reference: ops/test_validation.py, trainer/trainer.py:956 run_eval) on a
converted checkpoint:

    python ops_tests/accuracy_eval.py fai-detr-l-coco \
        --weights ~/FocoosTPU/models/fai-detr-l-coco/model_final.npz \
        --dataset ~/FocoosTPU/datasets/coco_val2017 --layout roboflow_coco

Steps it performs:
  1. torch checkpoint → flax pytree via tools/convert_torch_weights.py
     (skipped when --weights already points at a converted .npz),
  2. ModelManager.get(name) + weight load,
  3. AutoDataset val split + evaluate_dataset (the same numpy COCO core that
     tests/test_coco_eval_oracle.py proves equal to the pycocotools algorithm
     to 1e-8),
  4. prints a table: metric | measured | registry val_metrics | delta.

BLOCKER (round 2): this sandbox has no network egress, so the registry
weight URIs (model card `weights_uri`) cannot be downloaded and no real
val split is on disk — the harness is checked in, exercised end-to-end on
synthetic datasets through ops_tests/run_smoke.py, and the metric core is
validated against the pycocotools-transcribed oracle instead.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("model", help="registry model name, e.g. fai-detr-l-coco")
    ap.add_argument("--weights", required=True,
                    help=".npz converted weights or torch .pth to convert")
    ap.add_argument("--dataset", required=True, help="dataset root or zip")
    ap.add_argument("--layout", default="roboflow_coco")
    ap.add_argument("--split", default="valid")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--limit", type=int, default=0, help="eval only the first N images")
    ap.add_argument("--tolerance", type=float, default=0.1,
                    help="parity tolerance on the primary metric (BASELINE.md: ±0.1)")
    args = ap.parse_args()

    from focoos_tpu.data.auto_dataset import AutoDataset
    from focoos_tpu.model_manager import ModelManager
    from focoos_tpu.model_registry import ModelRegistry
    from focoos_tpu.ports import DatasetSplitType
    from focoos_tpu.trainer.evaluation import evaluate_dataset

    info = ModelRegistry.get_model_info(args.model)
    weights = args.weights
    if weights.endswith((".pth", ".pt")):
        from tools.convert_torch_weights import main as convert_main  # type: ignore

        out_dir = os.path.dirname(weights) or "."
        convert_main(weights, info.model_family.value, out_dir)
        weights = os.path.join(out_dir, "model_final.npz")

    model = ModelManager.get(args.model)
    model.load_weights(weights)

    task = model.task
    auto = AutoDataset(args.dataset, task=task, layout=args.layout)
    split = DatasetSplitType.VAL if args.split in ("valid", "val", "validation") else DatasetSplitType(args.split)
    val_ds = auto.get_split(split=split)
    if args.limit:
        val_ds._dataset.records = val_ds._dataset.records[: args.limit]

    results = evaluate_dataset(model, val_ds, batch_size=args.batch_size)

    flat = {}
    for ns, metrics in (results or {}).items():
        for k, v in metrics.items():
            flat[f"{ns}/{k}"] = v
    card = info.val_metrics or {}
    card_flat = {}
    for k, v in card.items():
        card_flat[k if "/" in k else k] = v

    print(f"\n== accuracy parity: {args.model} ==")
    print(f"{'metric':28s} {'measured':>10s} {'registry':>10s} {'delta':>8s}")
    worst = 0.0
    for k in sorted(set(flat) | set(card_flat)):
        m = flat.get(k)
        r = card_flat.get(k)
        if m is None or r is None or not isinstance(r, (int, float)):
            continue
        delta = m - float(r)
        worst = max(worst, abs(delta))
        print(f"{k:28s} {m:10.3f} {float(r):10.3f} {delta:+8.3f}")
    print(json.dumps({"model": args.model, "measured": flat, "registry": card_flat}))
    if worst > args.tolerance:
        print(f"FAIL: worst |delta| {worst:.3f} > tolerance {args.tolerance}")
        return 1
    print(f"PASS: worst |delta| {worst:.3f} <= {args.tolerance}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
