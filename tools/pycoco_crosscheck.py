"""One-command pycocotools cross-check of the numpy COCO metric core.

BLOCKER in this sandbox: pycocotools is NOT installed and there is no
network egress to install it (verified rounds 1-3). The in-repo validation
chain is tests/test_coco_eval_oracle.py (a transcription of the published
COCOeval algorithm, agreeing with coco_eval.py to 1e-8), but a transcription
shares any misreading of the original with itself — so the first environment
WITH network should run this script once (VERDICT r2 #9):

    pip install pycocotools && python tools/pycoco_crosscheck.py

It feeds the oracle test's exact randomized fixtures (same seeds) through
real pycocotools COCOeval and diffs every summarize() metric against
focoos_tpu.trainer.evaluation.coco_eval.CocoStyleEvaluator to 1e-8.
See also ops_tests/accuracy_eval.py for the full weights→eval parity chain.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def to_coco_json(images, num_classes):
    """Oracle fixtures → pycocotools COCO gt/dt dicts."""
    gt = {
        "info": {}, "licenses": [],
        "images": [{"id": i, "width": 640, "height": 640} for i in range(len(images))],
        "categories": [{"id": c, "name": str(c)} for c in range(num_classes)],
        "annotations": [],
    }
    dt = []
    ann_id = 1
    for img_id, im in enumerate(images):
        for g in im["gts"]:
            gt["annotations"].append({
                "id": ann_id, "image_id": img_id, "category_id": g["cls"],
                "bbox": [float(v) for v in g["bbox"]], "area": float(g["area"]),
                "iscrowd": int(g["iscrowd"]),
            })
            ann_id += 1
        for d in im["dts"]:
            dt.append({
                "image_id": img_id, "category_id": d["cls"],
                "bbox": [float(v) for v in d["bbox"]], "score": float(d["score"]),
            })
    return gt, dt


def main() -> int:
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        print("BLOCKED: pycocotools is not installed (no network egress in this "
              "sandbox). Run `pip install pycocotools` first — see module docstring.")
        return 2

    import json
    import tempfile

    from test_coco_eval_oracle import _random_scene, _run_repo_eval

    names = ["AP", "AP50", "AP75", "APs", "APm", "APl",
             "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]
    worst = 0.0
    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        num_classes = 4
        images = [
            _random_scene(rng, num_classes, n_gt=int(rng.integers(0, 12)),
                          n_dt=int(rng.integers(0, 8)))
            for _ in range(8)
        ]
        got = _run_repo_eval(images, num_classes)
        gt_json, dt_json = to_coco_json(images, num_classes)
        with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
            json.dump(gt_json, f)
            gt_path = f.name
        coco_gt = COCO(gt_path)
        coco_dt = coco_gt.loadRes(dt_json)
        ev = COCOeval(coco_gt, coco_dt, iouType="bbox")
        ev.evaluate()
        ev.accumulate()
        ev.summarize()
        os.unlink(gt_path)
        for i, name in enumerate(names):
            ours = got.get(name)
            theirs = float(ev.stats[i])
            if ours is None:
                continue
            # pycocotools reports -1 where our core reports NaN (no gts)
            if theirs == -1.0 and (ours != ours or ours == -1.0):
                continue
            d = abs(float(ours) - theirs)
            worst = max(worst, d)
            status = "OK" if d < 1e-8 else "** MISMATCH **"
            print(f"seed {seed} {name:6s} ours={float(ours):.10f} pycoco={theirs:.10f} |Δ|={d:.2e} {status}")
    print(f"worst |Δ| = {worst:.2e}")
    return 0 if worst < 1e-8 else 1


if __name__ == "__main__":
    sys.exit(main())
