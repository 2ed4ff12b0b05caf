"""On-device mask-IoU for instance-segmentation eval.

The eval decode (`fai_mf/processor._device_instance_decode`) bit-packs the
K predicted binary masks on device; fetching them to the host costs
K·H·W/8 bytes per image (5.1 MB at K=100 @640²) — the dominant eval cost on
bandwidth-limited links. But the ONLY downstream consumer of those masks is
the COCO evaluator's dt×gt IoU matrix (reference flow:
focoos/trainer/evaluation/detection_evaluation.py:356 → pycocotools
maskUtils.iou). So compute the IoU ON DEVICE: upload the (few, small)
bit-packed GT masks, unpack both sides on device, take one [K,HW]×[HW,G]
matmul on the MXU for the intersections, and fetch only the [K,G] IoU
matrix + [K] det areas (~KBs instead of MBs).

Exactness: all counts are integer-valued f32 sums of {0,1} products; they
stay exact below 2^24 (HW = 640² = 409600 ≪ 2^24), so the IoUs are
bit-identical to the host `focoos_tpu.utils.native.mask_iou` path (COCO
crowd convention on the GT side included). Verified by
tests/test_processors.py::test_device_mask_iou_matches_host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

_IOU_FNS = {}


def _iou_fn(k: int, nbytes: int, gpad: int):
    import jax
    import jax.numpy as jnp

    key = (k, nbytes, gpad)
    if key not in _IOU_FNS:

        def fn(dt_packed, gt_packed, gt_crowd, gt_valid):
            dt = jnp.unpackbits(dt_packed, axis=-1).astype(jnp.float32)  # [K, HW']
            gt = jnp.unpackbits(gt_packed, axis=-1).astype(jnp.float32)  # [G, HW']
            inter = jnp.einsum("kp,gp->kg", dt, gt)  # integer-valued f32
            a_dt = dt.sum(-1)  # [K]
            a_gt = gt.sum(-1)  # [G]
            union = jnp.where(gt_crowd[None, :] > 0, a_dt[:, None], a_dt[:, None] + a_gt[None, :] - inter)
            iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
            return iou * gt_valid[None, :], a_dt

        _IOU_FNS[key] = jax.jit(fn)
    return _IOU_FNS[key]


def device_mask_iou_packed(dt_packed, hw: Tuple[int, int], gt_masks, gt_crowd=None):
    """[K]×[G] IoU matrix from device-resident packed dt masks.

    ``dt_packed``: [K, ceil(HW/8)] uint8, usually still on device.
    ``gt_masks``: host [G, H, W] bool/uint8 (dataset GT). Padded to a
    power-of-two G bucket so the jit compiles per (K, HW, bucket), not per
    image. Returns (iou [K, G] float32 np, dt_areas [K] float64 np).
    """
    import jax.numpy as jnp

    k, nbytes = dt_packed.shape
    g = len(gt_masks)
    if g == 0:
        # still fetch areas (needed for area-range filtering fallbacks)
        dt = np.unpackbits(np.asarray(dt_packed), axis=-1, count=hw[0] * hw[1])
        return np.zeros((k, 0), np.float32), dt.sum(-1).astype(np.float64)
    gpad = 1
    while gpad < g:
        gpad *= 2
    gt = np.zeros((gpad, nbytes), np.uint8)
    stacked = np.stack([np.asarray(m, np.uint8).reshape(-1) for m in gt_masks])
    gt[:g] = np.packbits(stacked, axis=-1)[:, :nbytes]
    crowd = np.zeros(gpad, np.float32)
    if gt_crowd is not None:
        crowd[:g] = np.asarray(gt_crowd, np.float32)
    valid = np.zeros(gpad, np.float32)
    valid[:g] = 1.0
    iou, a_dt = _iou_fn(k, nbytes, gpad)(
        jnp.asarray(dt_packed), jnp.asarray(gt), jnp.asarray(crowd), jnp.asarray(valid)
    )
    return np.asarray(iou)[:, :g], np.asarray(a_dt, np.float64)
