"""Core-type serialization tests (reference model: tests/test_ports.py)."""

import json
import os

import numpy as np
import pytest

from focoos_tpu.ports import (
    ArtifactName,
    FocoosDet,
    FocoosDetections,
    InferLatency,
    ModelFamily,
    ModelInfo,
    ModelStatus,
    RuntimeType,
    Task,
    TrainerArgs,
)


def test_focoos_det_from_json_coerces_bbox():
    det = FocoosDet.from_json({"bbox": [1.7, 2.2, 10.9, 20.1], "conf": 0.5, "cls_id": 3})
    assert det.bbox == [1, 2, 10, 20]
    assert det.conf == 0.5


def test_detections_model_dump_roundtrip():
    dets = FocoosDetections(
        detections=[FocoosDet(bbox=[0, 0, 5, 5], conf=0.9, cls_id=1, label="cat")],
        latency=InferLatency(inference=0.01),
    )
    d = dets.model_dump()
    assert d["detections"][0]["label"] == "cat"
    back = FocoosDetections.from_json(d)
    assert back.detections[0].bbox == [0, 0, 5, 5]
    assert back.latency.inference == 0.01


def test_model_info_json_roundtrip(tmp_path):
    info = ModelInfo(
        name="m", model_family=ModelFamily.DETR, classes=["a", "b"], im_size=320,
        task=Task.DETECTION, config={"num_classes": 2}, status=ModelStatus.TRAINING_COMPLETED,
    )
    path = info.dump_json(str(tmp_path))
    assert os.path.basename(path) == ArtifactName.INFO.value
    loaded = ModelInfo.from_json(str(tmp_path))
    assert loaded.model_family == ModelFamily.DETR
    assert loaded.num_classes == 2
    assert loaded.im_size == 320


def test_trainer_args_num_gpus_alias():
    args = TrainerArgs.from_dict({"run_name": "x", "num_gpus": 4, "learning_rate": 1e-3})
    assert args.num_devices == 4
    assert args.num_gpus == 4
    assert args.learning_rate == 1e-3


def test_runtime_type_export_format():
    assert RuntimeType.STABLEHLO.to_export_format().value == "stablehlo"
    assert RuntimeType.XLA_TPU_BF16.to_export_format().value == "params"


def test_native_rle_roundtrip():
    from focoos_tpu.utils import native

    rng = np.random.default_rng(3)
    m = rng.random((37, 53)) > 0.7
    counts = native.rle_encode(m)
    assert (native.rle_decode(counts, 37, 53) == m).all()
    assert native.rle_area(counts) == int(m.sum())


def test_coco_rle_string_codec():
    """Compressed-RLE string codec vs the pycocotools wire format: the known
    encoding of a tiny mask, round-trips, and dict decode (crowd regions in
    COCO JSON ship as compressed RLE)."""
    from focoos_tpu.utils import native

    rng = np.random.default_rng(7)
    for shape in [(5, 4), (37, 53), (64, 64)]:
        m = rng.random(shape) > 0.6
        counts = native.rle_encode(m)
        s = native.rle_to_string(counts)
        back = native.rle_from_string(s)
        assert (back == counts).all(), shape
        dec = native.coco_rle_decode({"size": list(shape), "counts": s}, *shape)
        assert (dec == m).all(), shape
    # uncompressed counts list path
    m = np.zeros((3, 3), bool)
    m[:, 1] = True  # column-major: 3 zeros, 3 ones, 3 zeros
    dec = native.coco_rle_decode({"size": [3, 3], "counts": [3, 3, 3]}, 3, 3)
    assert (dec == m).all()
