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


def _iou_core(dt_packed, gt_packed, gt_crowd, gt_valid):
    """Plain (unjitted) kernel shared by the per-image and batched entry
    points: unpack both sides, one MXU matmul for intersections, exact
    integer-valued f32 arithmetic throughout."""
    import jax.numpy as jnp

    dt = jnp.unpackbits(dt_packed, axis=-1).astype(jnp.float32)  # [K, HW']
    gt = jnp.unpackbits(gt_packed, axis=-1).astype(jnp.float32)  # [G, HW']
    inter = jnp.einsum("kp,gp->kg", dt, gt)  # integer-valued f32
    a_dt = dt.sum(-1)  # [K]
    a_gt = gt.sum(-1)  # [G]
    union = jnp.where(gt_crowd[None, :] > 0, a_dt[:, None], a_dt[:, None] + a_gt[None, :] - inter)
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-9), 0.0)
    return iou * gt_valid[None, :], a_dt


def _jitted(key, make):
    if key not in _IOU_FNS:
        _IOU_FNS[key] = make()
    return _IOU_FNS[key]


def _pack_gt(gt_lists, gpad: int, nbytes: int, hw: Tuple[int, int], gt_crowds=None):
    n = len(gt_lists)
    n_pix = hw[0] * hw[1]
    if (n_pix + 7) // 8 != nbytes:
        raise ValueError(
            f"dt packed width {nbytes} bytes does not match hw={hw} "
            f"(expected ceil({n_pix}/8)={(n_pix + 7) // 8}) — dt and gt masks "
            "must share one resolution for the IoU to be exact")
    gt = np.zeros((n, gpad, nbytes), np.uint8)
    crowd = np.zeros((n, gpad), np.float32)
    valid = np.zeros((n, gpad), np.float32)
    for i, gm in enumerate(gt_lists):
        if len(gm):
            stacked = np.stack([np.asarray(m, np.uint8).reshape(-1) for m in gm])
            if stacked.shape[-1] != n_pix:
                # a silent [:, :nbytes] truncation here would yield plausible
                # but WRONG IoU/AP on a resolution mismatch — fail loudly
                raise ValueError(
                    f"GT mask has {stacked.shape[-1]} pixels, expected {n_pix} "
                    f"(hw={hw}); resize GT to the dt decode resolution first")
            gt[i, : len(gm)] = np.packbits(stacked, axis=-1)
            valid[i, : len(gm)] = 1.0
            if gt_crowds is not None and gt_crowds[i] is not None:
                crowd[i, : len(gm)] = np.asarray(gt_crowds[i], np.float32)
    return gt, crowd, valid


def _gpad_for(gmax: int) -> int:
    """Power-of-two bucket with a floor of 8: per-image GT counts vary
    batch to batch, and every new bucket is a fresh XLA compile (~50 s over
    a remote tunnel) — the floor makes G ≤ 8 (the common case) one single
    program, with 16/32/64/128 only for genuinely crowded images."""
    gpad = 8
    while gpad < gmax:
        gpad *= 2
    return gpad


def device_mask_iou_packed_batch(dt_packed_list, hw: Tuple[int, int], gt_lists, gt_crowds=None):
    """Batched form: ONE device dispatch + ONE fetch for a whole eval batch
    (per-image calls cost one tunnel RTT each — ~0.2 s/batch at b8).

    ``dt_packed_list``: per-image [K, ceil(HW/8)] uint8 (device or host).
    ``gt_lists``: per-image list of [H, W] GT masks. Returns a list of
    [K, G_i] float32 IoU matrices.
    """
    import jax
    import jax.numpy as jnp

    n = len(dt_packed_list)
    if n == 0:
        return []
    k, nbytes = dt_packed_list[0].shape
    gmax = max((len(g) for g in gt_lists), default=0)
    if gmax == 0:
        return [np.zeros((k, 0), np.float32) for _ in range(n)]
    gpad = _gpad_for(gmax)
    # pad the image axis to its own bucket too: a ragged last eval batch
    # must not trigger a fresh compile — dummy rows carry zero GT validity
    npad = _gpad_for(n)
    gt, crowd, valid = _pack_gt(gt_lists + [[]] * (npad - n), gpad, nbytes, hw,
                                (list(gt_crowds) + [None] * (npad - n)) if gt_crowds is not None else None)
    fn = _jitted(("batch", npad, k, nbytes, gpad), lambda: jax.jit(jax.vmap(_iou_core)))
    dt = jnp.stack([jnp.asarray(d) for d in dt_packed_list]
                   + [jnp.zeros((k, nbytes), jnp.uint8)] * (npad - n))
    iou, _ = fn(dt, jnp.asarray(gt), jnp.asarray(crowd), jnp.asarray(valid))
    iou = np.asarray(iou)
    return [iou[i, :, : len(gt_lists[i])] for i in range(n)]


def device_mask_iou_packed(dt_packed, hw: Tuple[int, int], gt_masks, gt_crowd=None):
    """[K]×[G] IoU matrix from device-resident packed dt masks.

    ``dt_packed``: [K, ceil(HW/8)] uint8, usually still on device.
    ``gt_masks``: host [G, H, W] bool/uint8 (dataset GT). Padded to a
    power-of-two G bucket so the jit compiles per (K, HW, bucket), not per
    image. Returns (iou [K, G] float32 np, dt_areas [K] float64 np).
    """
    import jax
    import jax.numpy as jnp

    k, nbytes = dt_packed.shape
    g = len(gt_masks)
    if g == 0:
        # still fetch areas (needed for area-range filtering fallbacks)
        dt = np.unpackbits(np.asarray(dt_packed), axis=-1, count=hw[0] * hw[1])
        return np.zeros((k, 0), np.float32), dt.sum(-1).astype(np.float64)
    gpad = _gpad_for(g)
    gt, crowd, valid = _pack_gt([gt_masks], gpad, nbytes, hw, [gt_crowd] if gt_crowd is not None else None)
    fn = _jitted((k, nbytes, gpad), lambda: jax.jit(_iou_core))
    iou, a_dt = fn(jnp.asarray(dt_packed), jnp.asarray(gt[0]), jnp.asarray(crowd[0]), jnp.asarray(valid[0]))
    return np.asarray(iou)[:, :g], np.asarray(a_dt, np.float64)
