"""Built-in dataset catalog (reference: focoos/data/catalog/catalog.py:17-209).

Registers well-known datasets (COCO det/instseg/keypoints, ADE20K, VOC) by
their standard on-disk layouts under ``DATASETS_DIR``. Entries resolve
lazily — a catalog name only needs its files present when actually loaded.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Dict

from focoos_tpu.data.datasets import DictDataset
from focoos_tpu.ports import DATASETS_DIR, DatasetSplitType, Task


@dataclass
class CatalogSplit:
    loader: Callable[[], DictDataset]


@dataclass
class CatalogDataset:
    name: str
    task: Task
    splits: Dict[DatasetSplitType, CatalogSplit]


_CATALOG: Dict[str, CatalogDataset] = {}


def register_catalog_dataset(name: str, task: Task, splits: Dict[DatasetSplitType, CatalogSplit]) -> None:
    _CATALOG[name] = CatalogDataset(name, task, splits)


def list_catalog() -> list:
    return sorted(_CATALOG)


def load_catalog_split(name: str, split: DatasetSplitType) -> DictDataset:
    if name not in _CATALOG:
        raise KeyError(f"'{name}' not in catalog; available: {list_catalog()}")
    ds = _CATALOG[name]
    if split not in ds.splits:
        raise KeyError(f"{name} has no split {split}")
    return ds.splits[split].loader()


def _coco_split(json_rel: str, img_rel: str, task: Task) -> Callable[[], DictDataset]:
    def load() -> DictDataset:
        root = os.path.join(DATASETS_DIR, "coco")
        import json as _json

        from focoos_tpu.data.datasets import DictDataset as DD
        from focoos_tpu.ports import DatasetMetadata

        with open(os.path.join(root, json_rel)) as f:
            coco = _json.load(f)
        cats = sorted(coco["categories"], key=lambda c: c["id"])
        id_map = {c["id"]: i for i, c in enumerate(cats)}
        anns_by_img: Dict[int, list] = {}
        for a in coco.get("annotations", []):
            anns_by_img.setdefault(a["image_id"], []).append(a)
        records = []
        for img in coco["images"]:
            annotations = []
            for a in anns_by_img.get(img["id"], []):
                ann = dict(bbox=a["bbox"], category_id=id_map[a["category_id"]], iscrowd=a.get("iscrowd", 0))
                if task == Task.INSTANCE_SEGMENTATION and a.get("segmentation"):
                    ann["segmentation"] = a["segmentation"]
                if task == Task.KEYPOINT and a.get("keypoints"):
                    ann["keypoints"] = a["keypoints"]
                annotations.append(ann)
            records.append(
                dict(file_name=os.path.join(root, img_rel, img["file_name"]), image_id=img["id"],
                     height=img["height"], width=img["width"], annotations=annotations)
            )
        meta = DatasetMetadata(
            num_classes=len(cats), task=task, count=len(records), name="coco",
            thing_classes=[c["name"] for c in cats],
        )
        return DD(records, meta)

    return load


# standard entries (resolved lazily)
register_catalog_dataset(
    "coco_2017_det",
    Task.DETECTION,
    {
        DatasetSplitType.TRAIN: CatalogSplit(_coco_split("annotations/instances_train2017.json", "train2017", Task.DETECTION)),
        DatasetSplitType.VAL: CatalogSplit(_coco_split("annotations/instances_val2017.json", "val2017", Task.DETECTION)),
    },
)
register_catalog_dataset(
    "coco_2017_ins",
    Task.INSTANCE_SEGMENTATION,
    {
        DatasetSplitType.TRAIN: CatalogSplit(
            _coco_split("annotations/instances_train2017.json", "train2017", Task.INSTANCE_SEGMENTATION)
        ),
        DatasetSplitType.VAL: CatalogSplit(
            _coco_split("annotations/instances_val2017.json", "val2017", Task.INSTANCE_SEGMENTATION)
        ),
    },
)
register_catalog_dataset(
    "coco_2017_kpts",
    Task.KEYPOINT,
    {
        DatasetSplitType.TRAIN: CatalogSplit(
            _coco_split("annotations/person_keypoints_train2017.json", "train2017", Task.KEYPOINT)
        ),
        DatasetSplitType.VAL: CatalogSplit(
            _coco_split("annotations/person_keypoints_val2017.json", "val2017", Task.KEYPOINT)
        ),
    },
)
