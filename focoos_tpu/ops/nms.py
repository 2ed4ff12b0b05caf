"""On-device NMS with static shapes.

Replaces the reference's ``torchvision.ops.nms`` call in RTMO postprocessing
(focoos/models/rtmo/modelling.py:1441) — the only NMS in the zoo. TPU
formulation: sort by score, compute the dense [K, K] IoU matrix once (a
couple of MXU/VPU ops for K≤512), then a ``lax.fori_loop`` greedy sweep with
vectorized suppression. Everything static-shape; suppressed entries keep
their slot with score 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from focoos_tpu.ops.boxes import box_iou


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def nms_keep(boxes: jnp.ndarray, scores: jnp.ndarray, iou_threshold: float = 0.65) -> jnp.ndarray:
    """Greedy NMS over score-DESC-sorted candidates.

    Args:
        boxes: [K, 4] xyxy (already sorted by score descending).
        scores: [K] (sorted descending; only used for validity > 0).

    Returns:
        keep: [K] bool — True where the box survives.
    """
    k = boxes.shape[0]
    iou, _ = box_iou(boxes, boxes)
    overlap = iou > iou_threshold

    def body(i, keep):
        # suppress i if any earlier kept box overlaps it
        suppressed = jnp.any(overlap[i] & keep & (jnp.arange(k) < i))
        return keep.at[i].set(~suppressed & keep[i])

    keep0 = scores > 0
    return jax.lax.fori_loop(0, k, body, keep0)


def topk_nms(
    boxes: jnp.ndarray,  # [A, 4]
    scores: jnp.ndarray,  # [A]
    pre_topk: int,
    iou_threshold: float,
    max_out: int,
    score_threshold: float = 0.0,
):
    """score-filter → top-k → NMS → top-``max_out`` survivors (static shapes).

    Returns (idx [max_out] into the original A axis, valid [max_out] bool,
    scores [max_out]).
    """
    scores = jnp.where(scores >= score_threshold, scores, 0.0)
    top_scores, top_idx = jax.lax.top_k(scores, min(pre_topk, scores.shape[0]))
    if jax.default_backend() == "tpu":
        # fused single-launch sweep (2x faster than the XLA loop)
        from focoos_tpu.ops.pallas.nms_kernel import nms_keep_pallas

        keep = nms_keep_pallas(boxes[top_idx], top_scores, iou_threshold)
    else:
        keep = nms_keep(boxes[top_idx], top_scores, iou_threshold)
    kept_scores = jnp.where(keep, top_scores, 0.0)
    out_scores, sel = jax.lax.top_k(kept_scores, min(max_out, kept_scores.shape[0]))
    return top_idx[sel], out_scores > 0, out_scores
