"""Geometric-container tests (reference model: focoos/structures.py usage)."""

import numpy as np
import pytest

from focoos_tpu.structures import (
    BitMasks,
    BoxMode,
    Boxes,
    ImageList,
    Instances,
    Keypoints,
    pairwise_ioa,
    pairwise_iou,
    polygons_to_bitmask,
)


def test_boxmode_convert_roundtrip():
    xyxy = np.array([[10.0, 20.0, 50.0, 80.0]])
    xywh = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(xywh, [[10, 20, 40, 60]])
    back = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(back, xyxy)


def test_boxes_ops():
    b = Boxes(np.array([[0, 0, 10, 10], [5, 5, 8, 8], [-5, -5, 3, 3]], np.float32))
    np.testing.assert_allclose(b.area(), [100, 9, 64])
    assert list(b.nonempty()) == [True, True, True]
    np.testing.assert_allclose(b.get_centers()[0], [5, 5])
    b.clip((10, 10))  # h, w
    assert b.tensor[2, 0] == 0 and b.tensor[2, 1] == 0
    b.scale(2.0, 0.5)
    np.testing.assert_allclose(b.tensor[0], [0, 0, 20, 5])
    assert len(Boxes.cat([b, b])) == 6


def test_pairwise_iou_ioa():
    a = Boxes(np.array([[0, 0, 10, 10]], np.float32))
    c = Boxes(np.array([[0, 0, 5, 10], [10, 10, 20, 20]], np.float32))
    iou = pairwise_iou(a, c)
    np.testing.assert_allclose(iou, [[0.5, 0.0]])
    ioa = pairwise_ioa(a, c)  # intersection over the SECOND set's areas
    np.testing.assert_allclose(ioa, [[1.0, 0.0]])


def test_polygons_to_bitmask_and_bitmasks():
    # a 4x4 square polygon inside a 10x10 canvas
    poly = [np.array([2, 2, 6, 2, 6, 6, 2, 6], np.float64)]
    m = polygons_to_bitmask(poly, 10, 10)
    assert m.dtype == bool and m.shape == (10, 10)
    assert m[3, 3] and not m[8, 8]

    bm = BitMasks(np.stack([m, np.zeros((10, 10), bool)]))
    assert list(bm.nonempty()) == [True, False]
    boxes = bm.get_bounding_boxes().tensor
    x0, y0, x1, y1 = boxes[0]
    assert x0 >= 1 and y0 >= 1 and x1 <= 7 and y1 <= 7  # tight-ish box around the square


def test_instances_fields_and_indexing():
    inst = Instances((100, 100), boxes=Boxes(np.array([[0, 0, 5, 5], [1, 1, 9, 9]], np.float32)),
                     classes=np.array([0, 1]), scores=np.array([0.9, 0.4]))
    assert len(inst) == 2
    assert inst.has("scores") and not inst.has("masks")
    sub = inst[inst.scores > 0.5]
    assert len(sub) == 1 and sub.classes[0] == 0


def test_keypoints_container():
    k = Keypoints(np.zeros((2, 17, 3), np.float32))
    assert len(k) == 2
    assert k[0:1].tensor.shape == (1, 17, 3)


def test_imagelist_padding_and_divisibility():
    ims = [np.ones((30, 40, 3), np.uint8), np.ones((50, 20, 3), np.uint8)]
    il = ImageList.from_tensors(ims, size_divisibility=32)
    assert il.tensor.shape[1] % 32 == 0 and il.tensor.shape[2] % 32 == 0
    assert il.tensor.shape[0] == 2
    assert il.image_sizes == [(30, 40), (50, 20)]
    # padded area is zero
    assert il.tensor[0, 35:, :, :].sum() == 0

    sq = ImageList.from_tensors(ims, square_size=64)
    assert sq.tensor.shape[1:3] == (64, 64)
