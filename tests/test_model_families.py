"""Per-family API contract tests: ModelManager → FocoosModel → infer →
FocoosDetections (reference model: tests run each family's forward; parity vs
the torch implementation lives in tools/parity.py)."""

import numpy as np
import pytest

from focoos_tpu.model_manager import ModelManager

pytestmark = pytest.mark.slow

FAMILY_CASES = [
    ("fai-detr-m-coco", dict(num_queries=10, transformer_predictor_dec_layers=2), 96),
    ("fai-cls-n-coco", dict(), 96),
    ("fai-mf-s-coco-ins", dict(num_queries=10, transformer_predictor_dec_layers=2,
                               criterion_num_points=256), 96),
    ("bisenetformer-s-ade", dict(num_queries=10, transformer_predictor_dec_layers=2,
                                 criterion_num_points=256), 96),
    ("rtmo-s-coco", dict(transformer_encoder_layers=1, nms_pre_topk=50, max_detections=10), 128),
]


@pytest.mark.parametrize("name,kwargs,res", FAMILY_CASES, ids=[c[0] for c in FAMILY_CASES])
def test_family_infer_contract(name, kwargs, res):
    model = ModelManager.get(name, num_classes=3, classes=["a", "b", "c"],
                             image_size=res, **kwargs)
    img = np.random.randint(0, 255, (res, res, 3), np.uint8)
    dets = model.infer(img, threshold=0.0)
    assert dets.latency is not None and dets.latency.inference is not None
    for d in dets.detections:
        if d.cls_id is not None:
            assert 0 <= d.cls_id < 3
        if d.conf is not None:
            assert 0.0 <= d.conf <= 1.0
        if d.bbox is not None:
            x0, y0, x1, y1 = d.bbox
            assert x1 >= x0 and y1 >= y0
    # second call hits the per-shape jit cache (no retrace crash)
    dets2 = model.infer(img, threshold=0.0)
    assert len(dets2.detections) == len(dets.detections)

@pytest.mark.parametrize("name", ["fai-mf-s-coco-ins", "bisenetformer-s-ade"])
def test_seg_eval_masks_in_compute_dtype(name):
    """The eval-mode full-res mask upsample is the largest write of the seg
    eval graph; it must run in the module compute dtype (bf16 on TPU), not be
    silently promoted to f32 (regression for the measured 2.9 ms/fwd cost)."""
    import jax.numpy as jnp

    model = ModelManager.get(name, num_classes=3, classes=["a", "b", "c"], image_size=96,
                             num_queries=10, transformer_predictor_dec_layers=2,
                             criterion_num_points=256, dtype="bfloat16")
    x = np.random.rand(1, 96, 96, 3).astype(np.float32) * 255
    out, _ = model.module.apply(model.variables, x, train=False)
    assert out.masks.dtype == jnp.bfloat16
    assert out.masks.shape[2:] == (96, 96)  # upsampled to input res
    m = np.asarray(out.masks, dtype=np.float32)
    assert np.isfinite(m).all() and (m >= 0).all() and (m <= 1).all()
