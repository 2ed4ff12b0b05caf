"""Generate focoos_tpu model-registry cards.

Extracts the factual content (class lists, architecture hyper-parameters,
weight URIs, headline validation metrics) from the reference registry at
/root/reference/focoos/model_registry/*.json into our own compact card
schema. Facts, not code: per-class metric blobs and torch-specific latency
records are dropped; the TPU runtime fills its own latency records.

Run: python tools/gen_registry_cards.py
"""

import json
import os
import sys

REF_DIR = "/root/reference/focoos/model_registry"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "focoos_tpu", "model_registry")

HEADLINE = {
    "detection": ["bbox/AP", "bbox/AP50", "bbox/AP75", "bbox/APs", "bbox/APm", "bbox/APl"],
    "semseg": ["mIoU", "fwIoU", "mACC", "pACC"],
    "instseg": ["segm/AP", "segm/AP50", "segm/AP75", "bbox/AP"],
    "classification": ["f1", "precision", "recall", "accuracy"],
    "keypoint": ["keypoints/AP", "keypoints/AP50", "keypoints/AP75"],
}


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    count = 0
    for fn in sorted(os.listdir(REF_DIR)):
        if not fn.endswith(".json"):
            continue
        with open(os.path.join(REF_DIR, fn)) as f:
            src = json.load(f)
        task = src["task"]
        metrics = src.get("val_metrics") or {}
        headline = {k: round(v, 3) for k, v in metrics.items() if k in HEADLINE.get(task, [])}
        card = {
            "name": src["name"],
            "model_family": src["model_family"],
            "task": task,
            "im_size": src["im_size"],
            "description": src.get("description"),
            "status": "TRAINING_COMPLETED",
            "focoos_model": src.get("focoos_model"),
            "weights_uri": src.get("weights_uri"),
            "val_dataset": src.get("val_dataset"),
            "val_metrics": headline,
            "config": src["config"],
            "classes": src["classes"],
            # card-schema compat (reference ports.py:1191): hub-facing fields a
            # reference-trained card carries — provenance data, kept verbatim
            "ref": src.get("ref"),
            "focoos_version": src.get("focoos_version"),
            "updated_at": src.get("updated_at"),
            "train_args": src.get("train_args"),
            "latency": src.get("latency"),
        }
        out = os.path.join(OUT_DIR, fn)
        with open(out, "w") as f:
            json.dump(card, f, indent=1)
        count += 1
    print(f"wrote {count} cards to {OUT_DIR}")


if __name__ == "__main__":
    sys.exit(main())
