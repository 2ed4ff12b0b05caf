"""fai_detr training criterion — varifocal + box losses with on-device matching.

Re-derivation of the reference SetCriterion/BoxHungarianMatcher
(focoos/models/fai_detr/modelling.py:409-769) for TPU:

- Targets are padded to a static [B, N] with a validity mask instead of
  ragged per-image lists.
- The Hungarian assignment runs on-device (auction algorithm,
  focoos_tpu/ops/matching.py) instead of scipy-on-CPU.
- Deep supervision is a ``vmap`` over the stacked decoder layers (+1 encoder
  selection layer) — one fused graph instead of a python loop of matchings.
- ``num_boxes`` normalization is a plain global-batch sum: under pjit the
  reduction spans the data mesh, which reproduces the reference's
  ``all_reduce(num_boxes)/world_size`` exactly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from focoos_tpu.models.fai_detr.config import DETRConfig
from focoos_tpu.models.fai_detr.ports import DETRAuxOutputs, DETRTargets
from focoos_tpu.ops.boxes import (
    box_cxcywh_to_xyxy,
    elementwise_box_iou,
    elementwise_generalized_box_iou,
    generalized_box_iou,
)
from focoos_tpu.ops.matching import batched_auction_assign


def _focal_class_cost(probs_at_tgt: jnp.ndarray, alpha: float, gamma: float) -> jnp.ndarray:
    """Focal matching cost (reference: fai_detr/modelling.py:730-734)."""
    p = probs_at_tgt
    neg = (1 - alpha) * jnp.power(p, gamma) * (-jnp.log1p(-p + 1e-8))
    pos = alpha * jnp.power(1 - p, gamma) * (-jnp.log(p + 1e-8))
    return pos - neg


def compute_cost_matrix(
    logits: jnp.ndarray,  # [B, Q, C] raw
    boxes: jnp.ndarray,  # [B, Q, 4] cxcywh
    targets: DETRTargets,
    cfg: DETRConfig,
) -> jnp.ndarray:
    """→ [B, N, Q] matching cost (targets-major for the auction)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    # class cost at each target's label: [B, Q, N]
    p_t = jnp.take_along_axis(probs, targets.labels[:, None, :], axis=2)
    cost_class = _focal_class_cost(p_t, cfg.matcher_alpha, cfg.matcher_gamma)

    cost_bbox = jnp.sum(jnp.abs(boxes[:, :, None, :] - targets.boxes[:, None, :, :]), axis=-1)  # [B, Q, N]
    cost_giou = -jax.vmap(generalized_box_iou)(box_cxcywh_to_xyxy(boxes), box_cxcywh_to_xyxy(targets.boxes))

    c = cfg.matcher_cost_bbox * cost_bbox + cfg.matcher_cost_class * cost_class + cfg.matcher_cost_giou * cost_giou
    return jnp.transpose(c, (0, 2, 1))  # [B, N, Q]


def _layer_losses(
    logits: jnp.ndarray,  # [B, Q, C]
    boxes: jnp.ndarray,  # [B, Q, 4] cxcywh
    targets: DETRTargets,
    num_boxes: jnp.ndarray,  # scalar, global valid-target count (≥ 1)
    cfg: DETRConfig,
) -> Dict[str, jnp.ndarray]:
    """Match one prediction set and compute vfl/bbox/giou losses."""
    b, q, c = logits.shape
    n = targets.labels.shape[1]
    logits = logits.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)

    cost = compute_cost_matrix(logits, boxes, targets, cfg)
    cost = jax.lax.stop_gradient(cost)
    assign = batched_auction_assign(cost, targets.valid)  # [B, N] query idx per target
    assign = jnp.where(targets.valid, assign, q)  # invalid → dummy column q

    valid_f = targets.valid.astype(jnp.float32)

    # matched predictions per target
    src_boxes = jnp.take_along_axis(
        jnp.concatenate([boxes, jnp.zeros((b, 1, 4), boxes.dtype)], axis=1), assign[..., None], axis=1
    )  # [B, N, 4]

    # --- box losses (reference :513-530)
    l1 = jnp.sum(jnp.abs(src_boxes - targets.boxes), axis=-1) * valid_f
    loss_bbox = jnp.sum(l1) / num_boxes
    giou = elementwise_generalized_box_iou(box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(targets.boxes))
    loss_giou = jnp.sum((1.0 - giou) * valid_f) / num_boxes

    # --- varifocal loss (reference :464-497)
    ious = elementwise_box_iou(box_cxcywh_to_xyxy(src_boxes), box_cxcywh_to_xyxy(targets.boxes))
    ious = jax.lax.stop_gradient(ious) * valid_f  # [B, N]

    # scatter target one-hot + iou score into query space [B, Q(+1), C]
    onehot_n = jax.nn.one_hot(targets.labels, c, dtype=jnp.float32) * valid_f[..., None]  # [B, N, C]
    batch_idx = jnp.arange(b)[:, None] * jnp.ones((1, n), jnp.int32)
    t_onehot = jnp.zeros((b, q + 1, c), jnp.float32).at[batch_idx, assign].add(onehot_n)[:, :q]
    t_score = (
        jnp.zeros((b, q + 1, c), jnp.float32).at[batch_idx, assign].add(onehot_n * ious[..., None])[:, :q]
    )

    pred_score = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    weight = cfg.criterion_focal_alpha * jnp.power(pred_score, cfg.criterion_focal_gamma) * (1 - t_onehot) + t_score
    bce = optax_sigmoid_bce(logits, t_score)
    loss_vfl = jnp.sum(bce * weight) / num_boxes

    return {"loss_vfl": loss_vfl, "loss_bbox": loss_bbox, "loss_giou": loss_giou}


def optax_sigmoid_bce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable BCE-with-logits (no reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -labels * log_p - (1.0 - labels) * log_not_p


def detr_criterion(aux: DETRAuxOutputs, targets: DETRTargets, cfg: DETRConfig) -> Dict[str, jnp.ndarray]:
    """Full deep-supervision criterion (reference SetCriterion.forward :553-612).

    Returns a dict of weighted losses: last decoder layer unsuffixed, aux
    decoder layers suffixed ``_i``, encoder selection layer suffixed
    ``_enc`` — plus ``total``.
    """
    num_boxes = jnp.maximum(jnp.sum(targets.valid.astype(jnp.float32)), 1.0)

    # stack all supervised prediction sets: decoder layers + encoder top-k
    all_logits = jnp.concatenate([aux.dec_logits, aux.enc_logits[None]], axis=0)  # [L+1, B, Q, C]
    all_boxes = jnp.concatenate([aux.dec_boxes, aux.enc_boxes[None]], axis=0)

    per_layer = jax.vmap(lambda lg, bx: _layer_losses(lg, bx, targets, num_boxes, cfg))(all_logits, all_boxes)

    weights = {
        "loss_vfl": cfg.weight_dict_loss_vfl,
        "loss_bbox": cfg.weight_dict_loss_bbox,
        "loss_giou": cfg.weight_dict_loss_giou,
    }
    num_dec = aux.dec_logits.shape[0]
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    for k, w in weights.items():
        vals = per_layer[k] * w  # [L+1]
        losses[k] = vals[num_dec - 1]  # last decoder layer
        if cfg.criterion_deep_supervision:
            for i in range(num_dec - 1):
                losses[f"{k}_{i}"] = vals[i]
            losses[f"{k}_enc"] = vals[num_dec]
            total = total + jnp.sum(vals)
        else:
            total = total + vals[num_dec - 1]
    losses["total"] = total
    return losses


def make_loss_fn(module, cfg: DETRConfig):
    """Build the pure per-step loss closure consumed by build_train_step."""

    def loss_fn(variables, batch, rng):
        images, targets = batch
        (out, aux_out), new_model_state = module.apply(
            variables, images, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
        )
        losses = detr_criterion(aux_out, targets, cfg)
        total = losses.pop("total")
        return total, (losses, new_model_state)

    return loss_fn
