"""Processor postprocess unit tests with hand-built model outputs
(reference model: per-family processor tests)."""

import numpy as np
import pytest


def test_detr_postprocess_decode_and_scale():
    """One dominant query decodes to a scaled, thresholded, rounded box
    (reference: fai_detr/processor.py:146-217 flat top-k over QxC)."""
    import jax.numpy as jnp

    from focoos_tpu.models.fai_detr.config import DETRConfig
    from focoos_tpu.models.fai_detr.ports import DETRModelOutput
    from focoos_tpu.models.fai_detr.processor import DETRProcessor

    cfg = DETRConfig(num_classes=3, num_queries=4)
    p = DETRProcessor(cfg, image_size=100)
    logits = np.full((1, 4, 3), 0.01, np.float32)
    logits[0, 2, 1] = 0.9  # query 2, class 1
    boxes = np.zeros((1, 4, 4), np.float32)
    boxes[0, 2] = [0.1, 0.2, 0.5, 0.6]  # xyxy normalized
    out = DETRModelOutput(boxes=jnp.asarray(boxes), logits=jnp.asarray(logits))
    img = np.zeros((200, 400, 3), np.uint8)  # h=200, w=400
    dets = p.postprocess(out, [img], class_names=["a", "b", "c"], threshold=0.5)[0]
    assert len(dets.detections) == 1
    d = dets.detections[0]
    assert d.cls_id == 1 and d.label == "b"
    assert d.conf == pytest.approx(0.9, abs=1e-5)
    assert d.bbox == [40, 40, 200, 120]  # scaled by (w=400, h=200), rounded

    # threshold above the top score -> nothing survives
    dets2 = p.postprocess(out, [img], class_names=["a", "b", "c"], threshold=0.95)[0]
    assert len(dets2.detections) == 0


def test_cls_postprocess_multilabel_threshold():
    import jax.numpy as jnp

    from focoos_tpu.models.fai_cls.config import ClassificationConfig
    from focoos_tpu.models.fai_cls.ports import ClassificationModelOutput
    from focoos_tpu.models.fai_cls.processor import ClassificationProcessor

    cfg = ClassificationConfig(num_classes=3)
    p = ClassificationProcessor(cfg, image_size=64)
    # sigmoid(2.0)=0.88, sigmoid(-2)=0.12
    logits = np.array([[2.0, -2.0, 2.0]], np.float32)
    out = ClassificationModelOutput(logits=jnp.asarray(logits))
    dets = p.postprocess(out, [np.zeros((64, 64, 3), np.uint8)],
                         class_names=["x", "y", "z"], threshold=0.5)[0]
    got = sorted((d.cls_id, d.label) for d in dets.detections)
    assert got == [(0, "x"), (2, "z")]
    for d in dets.detections:
        assert d.conf == pytest.approx(1 / (1 + np.exp(-2.0)), abs=1e-4)


def test_rtmo_postprocess_mixed_size_padded_batch_keeps_coords():
    """With no configured image_size, get_batch pads (never resizes) mixed-size
    batches, so model coordinates are already in each image's own pixel frame —
    postprocess must not rescale them (ADVICE r1: image 2+ got scaled by
    w_i/w_0)."""
    import jax.numpy as jnp

    from focoos_tpu.models.rtmo.config import RTMOConfig
    from focoos_tpu.models.rtmo.ports import RTMOModelOutput
    from focoos_tpu.models.rtmo.processor import RTMOProcessor
    from focoos_tpu.nn.backbone.csp_darknet import CSPConfig

    cfg = RTMOConfig(num_classes=1, num_keypoints=2, backbone_config=CSPConfig())
    p = RTMOProcessor(cfg, image_size=None)

    B, D, K = 2, 3, 2
    scores = np.zeros((B, D), np.float32)
    scores[:, 0] = 0.9
    boxes = np.zeros((B, D, 4), np.float32)
    boxes[0, 0] = [10, 20, 30, 40]
    boxes[1, 0] = [50, 60, 70, 80]
    kpts = np.zeros((B, D, K, 2), np.float32)
    kpts[1, 0, 0] = [55, 65]
    out = RTMOModelOutput(
        scores=jnp.asarray(scores), labels=jnp.zeros((B, D), jnp.int32),
        boxes=jnp.asarray(boxes), boxes_scores=jnp.asarray(scores),
        keypoints=jnp.asarray(kpts), keypoints_scores=jnp.asarray(scores)[..., None].repeat(K, -1),
        keypoints_visible=jnp.ones((B, D, K)),
    )
    imgs = [np.zeros((128, 96, 3), np.uint8), np.zeros((64, 256, 3), np.uint8)]
    dets = p.postprocess(out, imgs, threshold=0.5)
    assert dets[0].detections[0].bbox == [10, 20, 30, 40]
    assert dets[1].detections[0].bbox == [50, 60, 70, 80]  # must NOT be rescaled
    x, y, v = dets[1].detections[0].keypoints[0]
    # reference convention (rtmo/processor.py:183-185): keypoint y clips to
    # [0, h] — image 2 is 64 high, so y=65 clamps to 64 (verified by e2e
    # pipeline parity in round 3)
    assert (x, y) == (55, 64)

    # inference preprocess pads raw batches to 32-divisible for the Focus stem
    batch, _ = p.preprocess(imgs)
    assert batch.shape[1] % 32 == 0 and batch.shape[2] % 32 == 0


def test_semseg_eval_device_path_matches_host_path(monkeypatch):
    """The on-device einsum+argmax eval path must produce the same label map
    as the legacy host path (bilinear resize → einsum → argmax) when no
    resize is needed; argmax ties are excluded by construction (margin)."""
    import jax.numpy as jnp

    from focoos_tpu.models.fai_mf.config import MaskFormerConfig
    from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput
    from focoos_tpu.models.fai_mf.processor import MaskFormerProcessor
    from focoos_tpu.ports import DatasetEntry

    rng = np.random.default_rng(7)
    b, q, c, h, w = 2, 6, 4, 16, 16
    logits = rng.random((b, q, c), np.float32)
    masks = rng.random((b, q, h, w), np.float32)
    out = MaskFormerModelOutput(logits=jnp.asarray(logits), masks=jnp.asarray(masks), loss=None)
    entries = [
        DatasetEntry(image=np.zeros((h, w, 3), np.uint8), height=h, width=w) for _ in range(b)
    ]
    cfg = MaskFormerConfig(num_classes=c, postprocessing_type="semantic")
    proc = MaskFormerProcessor(cfg)

    monkeypatch.delenv("FOCOOS_SEMSEG_EVAL_HOST", raising=False)
    dev = proc.eval_postprocess(out, entries)
    monkeypatch.setenv("FOCOOS_SEMSEG_EVAL_HOST", "1")
    host = proc.eval_postprocess(out, entries)

    for d, hres in zip(dev, host):
        dmap = np.asarray(d["sem_seg"])
        hmap = np.asarray(hres["sem_seg"]).argmax(0)
        assert dmap.shape == hmap.shape
        # tolerate float-order argmax tie flips between einsum backends
        agree = (dmap == hmap).mean()
        assert agree > 0.999, f"device/host semseg eval disagree: {agree}"


def test_mf_instance_eval_device_matches_host(monkeypatch):
    """Device instance decode (top-k + mask-score + binarize + packbits on
    device) == host instance_inference when no resize is involved — exact
    same math, only the transport differs (VERDICT r3 next #5)."""
    import jax.numpy as jnp

    from focoos_tpu.models.fai_mf.config import MaskFormerConfig
    from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput
    from focoos_tpu.models.fai_mf.processor import MaskFormerProcessor
    from focoos_tpu.ports import DatasetEntry

    rng = np.random.default_rng(11)
    b, q, c, h, w = 2, 6, 4, 16, 16
    logits = rng.random((b, q, c), np.float32)
    masks = rng.random((b, q, h, w), np.float32)
    out = MaskFormerModelOutput(logits=jnp.asarray(logits), masks=jnp.asarray(masks), loss=None)
    entries = [DatasetEntry(image=np.zeros((h, w, 3), np.uint8), height=h, width=w) for _ in range(b)]
    cfg = MaskFormerConfig(num_classes=c, postprocessing_type="instance", top_k=5)
    proc = MaskFormerProcessor(cfg)

    monkeypatch.delenv("FOCOOS_INSTSEG_EVAL_HOST", raising=False)
    dev = proc.eval_postprocess(out, entries)
    monkeypatch.setenv("FOCOOS_INSTSEG_EVAL_HOST", "1")
    host = proc.eval_postprocess(out, entries)

    for d, hr in zip(dev, host):
        di, hi = d["instances"], hr["instances"]
        # same detections modulo top-k ordering: sort both by (score, label)
        dord = np.lexsort((np.asarray(di.classes), -np.asarray(di.scores)))
        hord = np.lexsort((np.asarray(hi.classes), -np.asarray(hi.scores)))
        np.testing.assert_allclose(np.asarray(di.scores)[dord], np.asarray(hi.scores)[hord], rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(di.classes)[dord], np.asarray(hi.classes)[hord])
        # device path keeps masks packed on device (never fetched in prod;
        # the evaluator consumes them via the on-device IoU, ops/mask_iou.py)
        hh, ww = di._masks_packed_hw
        dmasks = np.unpackbits(np.asarray(di.masks_packed), axis=-1,
                               count=hh * ww).reshape(-1, hh, ww).astype(bool)
        np.testing.assert_array_equal(dmasks[dord], np.asarray(hi.masks.tensor)[hord])
        np.testing.assert_allclose(
            np.asarray(di.boxes.tensor)[dord], np.asarray(hi.boxes.tensor)[hord], atol=1e-4)


def test_device_mask_iou_matches_host():
    """ops/mask_iou.py device IoU == native/numpy host mask IoU, exactly
    (integer-valued f32 counts; crowd convention on the GT side)."""
    from focoos_tpu.ops.mask_iou import device_mask_iou_packed
    from focoos_tpu.utils.native import mask_iou

    rng = np.random.default_rng(5)
    k, g, h, w = 7, 3, 33, 41  # non-multiple-of-8 HW exercises bit padding
    dt = rng.random((k, h, w)) > 0.6
    gt = [rng.random((h, w)) > 0.5 for _ in range(g)]
    crowd = np.array([0, 1, 0], np.uint8)
    packed = np.packbits(dt.reshape(k, -1), axis=-1)
    iou_dev, areas = device_mask_iou_packed(packed, (h, w), gt, gt_crowd=crowd)
    iou_host = mask_iou(list(dt), gt, crowd_b=crowd)
    np.testing.assert_allclose(iou_dev, iou_host, atol=1e-6)
    np.testing.assert_array_equal(areas, dt.reshape(k, -1).sum(-1))
    # empty-GT short circuit
    iou0, areas0 = device_mask_iou_packed(packed, (h, w), [])
    assert iou0.shape == (k, 0) and np.array_equal(areas0, areas)


def test_instseg_evaluator_packed_path_matches_dense():
    """End-to-end: InstanceSegmentationEvaluator fed packed device masks
    (iou_matrix path) produces the same AP as the dense-mask path."""
    import jax.numpy as jnp

    from focoos_tpu.ports import DatasetEntry
    from focoos_tpu.structures import BitMasks, Boxes, Instances
    from focoos_tpu.trainer.evaluation.evaluators import InstanceSegmentationEvaluator

    rng = np.random.default_rng(9)
    h, w, k, g, ncls = 32, 32, 6, 3, 4
    dt = rng.random((k, h, w)) > 0.55
    gt = dt[:g].copy()  # overlapping GT so AP is non-trivial
    gt[0, :4] ^= True
    scores = np.sort(rng.random(k).astype(np.float32))[::-1].copy()
    classes = rng.integers(0, ncls, k).astype(np.int64)
    boxes = np.tile(np.array([0, 0, w, h], np.float32), (k, 1))

    gt_inst = Instances((h, w), boxes=Boxes(np.tile(np.array([0, 0, w, h], np.float32), (g, 1))),
                        classes=classes[:g].copy(), masks=BitMasks(gt))
    entry = DatasetEntry(image=np.zeros((h, w, 3), np.uint8), height=h, width=w, instances=gt_inst)

    dense = Instances((h, w), boxes=Boxes(boxes), scores=scores, classes=classes, masks=BitMasks(dt))
    packed = Instances((h, w), boxes=Boxes(boxes), scores=scores, classes=classes,
                       masks_packed=jnp.asarray(np.packbits(dt.reshape(k, -1), axis=-1)))
    packed._masks_packed_hw = (h, w)

    ev_dense = InstanceSegmentationEvaluator(num_classes=ncls)
    ev_dense.process([entry], [{"instances": dense}])
    ev_packed = InstanceSegmentationEvaluator(num_classes=ncls)
    ev_packed.process([entry], [{"instances": packed}])
    rd, rp = ev_dense.evaluate(), ev_packed.evaluate()
    for key in ("segm", "bbox"):
        for mk, mv in rd[key].items():
            pv = rp[key][mk]
            if np.isnan(mv) and np.isnan(pv):  # e.g. APl with no large GTs
                continue
            assert abs(pv - mv) < 1e-9, (key, mk, pv, mv)


def test_mf_instance_eval_device_resizes_to_original(monkeypatch):
    """Device path crops the padded region and nearest-resizes binary masks to
    the original image size."""
    import jax.numpy as jnp

    from focoos_tpu.models.fai_mf.config import MaskFormerConfig
    from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput
    from focoos_tpu.models.fai_mf.processor import MaskFormerProcessor
    from focoos_tpu.ports import DatasetEntry

    rng = np.random.default_rng(3)
    b, q, c, h, w = 1, 4, 3, 16, 16
    out = MaskFormerModelOutput(
        logits=jnp.asarray(rng.random((b, q, c), np.float32)),
        masks=jnp.asarray(rng.random((b, q, h, w), np.float32)), loss=None)
    # valid region 12x16 inside the padded 16x16; original image 24x32
    entries = [DatasetEntry(image=np.zeros((12, 16, 3), np.uint8), height=24, width=32)]
    proc = MaskFormerProcessor(MaskFormerConfig(num_classes=c, postprocessing_type="instance", top_k=4))
    monkeypatch.delenv("FOCOOS_INSTSEG_EVAL_HOST", raising=False)
    (res,) = proc.eval_postprocess(out, entries)
    inst = res["instances"]
    assert np.asarray(inst.masks.tensor).shape == (4, 24, 32)
    assert inst.image_size == (24, 32)
