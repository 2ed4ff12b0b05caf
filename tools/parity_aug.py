"""Deterministic-transform parity: focoos_tpu.data.transforms vs the
reference's detectron2-fork transforms (focoos/data/transforms/transform.py).

Augmentation RNG cannot be aligned across frameworks, but every Transform's
APPLICATION is deterministic given its params — and that's what decides
whether the two frameworks train on the same pixels/geometry. This harness
instantiates both sides with identical params and compares apply_image /
apply_coords / apply_box / apply_segmentation.

Usage: python tools/parity_aug.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cmp(name, a, b, tol=0.0, count_tol=0.0):
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        print(f"  {name}: SHAPE {a.shape} vs {b.shape} ** MISMATCH **")
        return False
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    if count_tol > 0:
        # pixel comparisons: allow a fraction of off-by-one values (rounding)
        frac = float((d > 1.0).mean())
        ok = frac <= count_tol
        print(f"  {name}: max|Δ|={d.max():.3g} frac(>1)={frac:.4f} {'OK' if ok else '** MISMATCH **'}")
        return ok
    ok = d.max() <= tol
    print(f"  {name}: max|Δ|={d.max():.3g} {'OK' if ok else '** MISMATCH **'}")
    return ok


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import _reference_compat

    _reference_compat.install()

    from PIL import Image

    import focoos.data.transforms.transform as RT  # reference
    import focoos_tpu.data.transforms as JT  # ours

    rng = np.random.default_rng(0)
    H, W = 37, 53  # odd sizes: exercises rounding conventions
    img_u8 = rng.integers(0, 255, (H, W, 3), np.uint8)
    img_f32 = rng.normal(100, 40, (H, W, 3)).astype(np.float32)
    seg_u8 = rng.integers(0, 20, (H, W), np.uint8)
    coords = rng.uniform(0, [W, H], (40, 2)).astype(np.float32)
    boxes = np.sort(rng.uniform(0, [W, H, W, H], (12, 4)).astype(np.float32).reshape(12, 2, 2), axis=1).reshape(12, 4)

    ok = True
    # NOTE: HFlip/VFlip/Crop/Pad/Blend/NoOp come from the REAL fvcore package
    # in the reference (not vendored); fvcore is stubbed in this offline env,
    # so those cannot be executed for comparison. Their semantics are the
    # unambiguous textbook ones (x' = w - x, array slicing, np.pad, lerp) and
    # are unit-tested in tests/test_data_pipeline.py. Everything the
    # reference DEFINES in its transform fork is compared below.

    # --- Resize (down and up, uint8 + float + segmentation)
    for nh, nw, tag in [(21, 30, "down"), (64, 96, "up")]:
        t_r = RT.ResizeTransform(H, W, nh, nw, Image.BILINEAR)
        t_j = JT.ResizeTransform(H, W, nh, nw)
        ok &= _cmp(f"resize-{tag} u8 image", t_j.apply_image(img_u8), t_r.apply_image(img_u8), count_tol=0.002)
        ok &= _cmp(f"resize-{tag} f32 image", t_j.apply_image(img_f32), t_r.apply_image(img_f32), tol=2e-3)
        ok &= _cmp(f"resize-{tag} coords", t_j.apply_coords(coords.copy()), t_r.apply_coords(coords.copy()), tol=1e-4)
        ok &= _cmp(f"resize-{tag} seg", t_j.apply_segmentation(seg_u8), t_r.apply_segmentation(seg_u8))

    # --- Rotation (both expand modes; cv2-based on both sides)
    for expand in (False, True):
        t_r = RT.RotationTransform(H, W, 33.0, expand=expand, center=None)
        t_j = JT.RotationTransform(H, W, 33.0, expand=expand)
        ok &= _cmp(f"rotation(expand={expand}) coords",
                   t_j.apply_coords(coords.copy()), t_r.apply_coords(coords.copy()), tol=1e-6)
        ok &= _cmp(f"rotation(expand={expand}) u8 image",
                   t_j.apply_image(img_u8), t_r.apply_image(img_u8))
        ok &= _cmp(f"rotation(expand={expand}) seg",
                   t_j.apply_segmentation(seg_u8), t_r.apply_segmentation(seg_u8))

    # --- Extent (ROI remap)
    src = (4.0, 6.0, 40.0, 30.0)
    t_r = RT.ExtentTransform(src, (20, 28))  # (h, w) on both sides
    t_j = JT.ExtentTransform(src, (20, 28))
    ok &= _cmp("extent coords", t_j.apply_coords(coords.copy()), t_r.apply_coords(coords.copy()), tol=1e-3)
    ok &= _cmp("extent u8 image", t_j.apply_image(img_u8), t_r.apply_image(img_u8), count_tol=0.02)

    # --- FixedSizeCrop, deterministic pad-only path (image < crop size);
    # validates pad-side/size conventions and the crop+pad composition
    import focoos.data.transforms.augmentation as RA

    r_fsc = RA.FixedSizeCrop((64, 80), pad=True, pad_value=128.0, seg_pad_value=255).get_transform(img_u8)
    j_fsc = JT.FixedSizeCrop((64, 80), pad_value=128.0, seg_pad_value=255).get_transform(img_u8)
    ok &= _cmp("fixed_size_crop(pad) image", j_fsc.apply_image(img_u8.copy()), r_fsc.apply_image(img_u8.copy()))
    ok &= _cmp("fixed_size_crop(pad) seg", j_fsc.apply_segmentation(seg_u8.copy()), r_fsc.apply_segmentation(seg_u8.copy()))
    ok &= _cmp("fixed_size_crop(pad) coords", j_fsc.apply_coords(coords.copy()), r_fsc.apply_coords(coords.copy()), tol=1e-6)

    # --- ResizeShortestEdge output-shape rounding at odd sizes
    shapes_match = all(
        JT.ResizeShortestEdge([s], max_size=m).get_transform(np.zeros((h, w, 3), np.uint8)).__dict__.get("new_h")
        == RA.ResizeShortestEdge.get_output_shape(h, w, s, m)[0]
        and JT.ResizeShortestEdge([s], max_size=m).get_transform(np.zeros((h, w, 3), np.uint8)).new_w
        == RA.ResizeShortestEdge.get_output_shape(h, w, s, m)[1]
        for h, w, s, m in [(37, 53, 21, 1000), (480, 641, 633, 1333), (1023, 767, 640, 1024)]
    )
    print(f"  resize_shortest_edge output shapes: {'OK' if shapes_match else '** MISMATCH **'}")
    ok &= shapes_match

    ok &= mapper_parity()

    print("ALL AUG PARITY CHECKS PASSED" if ok else "AUG PARITY FAILURES")
    sys.exit(0 if ok else 1)


def mapper_parity():
    """Training-sample construction parity: the same record (image file +
    COCO-style annotations with XYWH boxes, polygon masks, keypoints) through
    the reference DetectionDatasetMapper and ours, with a FIXED deterministic
    transform (Resize) standing in for the RNG-driven augs. Compares the
    image tensor and every Instances field — the last data-side seam before
    the (already-verified) losses."""
    import tempfile

    import jax

    import _reference_compat

    _reference_compat.install()
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(4)
    H, W = 67, 89
    img = rng.integers(0, 255, (H, W, 3), np.uint8)
    f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
    Image.fromarray(img).save(f.name)

    # two instances: XYWH boxes, polygon masks, 17 keypoints
    anns = []
    for i, (x, y, w, h) in enumerate([(10, 8, 30, 25), (40, 30, 28, 20)]):
        poly = [x + 2, y + 2, x + w - 2, y + 2, x + w - 2, y + h - 2, x + 2, y + h - 2]
        kpts = []
        for k in range(17):
            kpts += [x + (k % 5) * w / 5.0 + 1, y + (k % 4) * h / 4.0 + 1, 2]
        anns.append({"bbox": [x, y, w, h], "bbox_mode": 1, "category_id": i,  # XYWH_ABS
                     "segmentation": [poly], "keypoints": kpts, "iscrowd": 0,
                     "area": float(w * h * 0.8)})
    record = {"file_name": f.name, "image_id": 0, "height": H, "width": W, "annotations": anns}

    import copy

    import focoos.data.transforms.transform as RT
    from focoos.data.mappers.detection_dataset_mapper import DetectionDatasetMapper as RefMapper

    # the reference rasterizes polygons with pycocotools (not installable
    # offline) — substitute OUR rasterizer on the reference side, so the mask
    # channel of this comparison checks the mapper plumbing (transform →
    # raster → Instances), not the rasterizer itself (that one is covered by
    # tests/test_structures.py + the pycocotools crosscheck script)
    import focoos.data.utils as rutils

    from focoos_tpu.structures import polygons_to_bitmask as j_poly2mask

    rutils.polygons_to_bitmask = lambda polys, h, w: j_poly2mask([np.asarray(p).reshape(-1) for p in polys], h, w)

    import focoos_tpu.data.transforms as JT
    from focoos_tpu.data.mappers import DetectionDatasetMapper as JaxMapper, KeypointDatasetMapper

    nh, nw = 48, 64
    ok = True
    for use_mask, use_kpt, tag in [(False, False, "det"), (True, False, "inst"), (False, True, "kpt")]:
        rmap = RefMapper(is_train=True, augmentations=[RT.ResizeTransform(H, W, nh, nw)],
                         image_format="RGB", use_instance_mask=use_mask, use_keypoint=use_kpt)
        r = rmap(copy.deepcopy(record))
        jcls = KeypointDatasetMapper if use_kpt else JaxMapper
        jmap = jcls(augmentations=[JT.ResizeTransform(H, W, nh, nw)], is_train=True)
        if use_mask:
            from focoos_tpu.data.mappers import InstanceDatasetMapper

            jmap = InstanceDatasetMapper(augmentations=[JT.ResizeTransform(H, W, nh, nw)], is_train=True)
        j = jmap(copy.deepcopy(record))

        rimg = r.image.numpy().transpose(1, 2, 0)
        ok &= _cmp(f"mapper[{tag}] image", j.image, rimg)
        ri, ji = r.instances, j.instances
        ok &= _cmp(f"mapper[{tag}] boxes", ji.boxes.tensor, ri.boxes.tensor.numpy(), tol=1e-4)
        ok &= _cmp(f"mapper[{tag}] classes", np.asarray(ji.classes), ri.classes.numpy())
        if use_mask:
            ok &= _cmp(f"mapper[{tag}] masks", np.asarray(ji.masks.tensor),
                       ri.masks.tensor.numpy())
        if use_kpt:
            ok &= _cmp(f"mapper[{tag}] keypoints", np.asarray(ji.keypoints.tensor),
                       ri.keypoints.tensor.numpy(), tol=1e-3)
    os.unlink(f.name)
    return ok


if __name__ == "__main__":
    main()
