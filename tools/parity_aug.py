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

    print("ALL AUG PARITY CHECKS PASSED" if ok else "AUG PARITY FAILURES")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
