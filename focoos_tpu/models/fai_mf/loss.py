"""Mask-classification criterion shared by fai_mf and bisenetformer.

Re-derivation of the reference SetCriterion / MaskHungarianMatcher
(focoos/models/fai_mf/loss.py:345-756, identical copy in
bisenetformer/loss.py) for TPU:

- Matching cost uses one shared uniform point set per image (reference
  :689-702) sampled on-device; assignment runs on-device via the auction
  matcher (focoos_tpu/ops/matching.py) instead of scipy.
- Mask losses are PointRend-sampled (uncertainty + random points,
  focoos/nn/layers/point_rend.py:73) — all static shapes.
- Deep supervision = python loop over the stacked [L+1] prediction sets with
  per-layer PRNG splits (vmap would force a single shared point set).
- GT masks arrive pre-downsampled to the mask-feature grid (processor);
  sampling is in normalized coords so loss semantics are preserved.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from focoos_tpu.models.fai_mf.config import MaskFormerConfig
from focoos_tpu.models.fai_mf.ports import MaskFormerAuxOutputs, MaskFormerTargets
from focoos_tpu.ops.matching import batched_auction_assign
from focoos_tpu.ops.point_sample import point_sample, uncertainty_sampled_coords


def _pair_bce(out_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """Pairwise mean BCE-with-logits cost [Q, P] × [N, P] → [Q, N]
    (reference batch_sigmoid_ce_loss :282)."""
    p = out_pts.shape[-1]
    pos = jax.nn.softplus(-out_pts)  # -log sigmoid(x)
    neg = jax.nn.softplus(out_pts)  # -log(1 - sigmoid(x))
    return (pos @ tgt_pts.T + neg @ (1.0 - tgt_pts).T) / p


def _pair_dice(out_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """Pairwise dice cost (reference batch_dice_loss :261)."""
    o = jax.nn.sigmoid(out_pts)
    num = 2.0 * (o @ tgt_pts.T)
    den = o.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    return 1.0 - (num + 1.0) / (den + 1.0)


def _matcher_coords(rng: jnp.ndarray, b: int, num_points: int) -> jnp.ndarray:
    """One shared uniform point set per image (reference :689-702).

    Module-level so the loss-parity harness (tools/parity_loss.py) can pin it
    to a deterministic grid on both frameworks.
    """
    return jax.random.uniform(rng, (b, 1, num_points, 2), jnp.float32)


def _match_one_layer(
    rng: jnp.ndarray,
    logits: jnp.ndarray,  # [B, Q, C+1]
    masks: jnp.ndarray,  # [B, Q, Hm, Wm]
    targets: MaskFormerTargets,
    cfg: MaskFormerConfig,
) -> jnp.ndarray:
    """→ assign [B, N]: query index per target (undefined where invalid)."""
    b, q = logits.shape[:2]
    n = targets.labels.shape[1]
    num_points = max(cfg.criterion_num_points, 1)

    if cfg.cls_sigmoid:
        probs = jax.nn.sigmoid(logits)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
    # cost_class[b, q, n] = -prob[b, q, label_n]
    cost_class = -jnp.take_along_axis(probs, targets.labels[:, None, :], axis=2)

    coords = _matcher_coords(rng, b, num_points)

    def per_image(msk_q, msk_n, coord):
        out_pts = point_sample(msk_q.astype(jnp.float32), jnp.broadcast_to(coord, (q, num_points, 2)))
        tgt_pts = point_sample(msk_n.astype(jnp.float32), jnp.broadcast_to(coord, (n, num_points, 2)))
        return _pair_bce(out_pts, tgt_pts), _pair_dice(out_pts, tgt_pts)

    cost_mask, cost_dice = jax.vmap(per_image)(masks, targets.masks, coords)
    c = cfg.matcher_cost_mask * cost_mask + cfg.matcher_cost_class * cost_class + cfg.matcher_cost_dice * cost_dice
    c = jax.lax.stop_gradient(jnp.transpose(c, (0, 2, 1)))  # [B, N, Q]
    return batched_auction_assign(c, targets.valid)


def _layer_losses(
    rng: jnp.ndarray,
    logits: jnp.ndarray,  # [B, Q, C+1]
    masks: jnp.ndarray,  # [B, Q, Hm, Wm]
    targets: MaskFormerTargets,
    num_masks: jnp.ndarray,
    cfg: MaskFormerConfig,
) -> Dict[str, jnp.ndarray]:
    b, q, c1 = logits.shape
    n = targets.labels.shape[1]
    hm, wm = masks.shape[2:]
    logits = logits.astype(jnp.float32)

    r_match, r_pts = jax.random.split(rng)
    assign = _match_one_layer(r_match, logits, masks, targets, cfg)
    assign = jnp.where(targets.valid, assign, q)  # dummy column for padding

    # --- classification loss (reference loss_labels :414-432, ce_loss path)
    num_classes = c1 - 1
    batch_idx = jnp.arange(b)[:, None] * jnp.ones((1, n), jnp.int32)
    tgt_cls = jnp.full((b, q + 1), num_classes, jnp.int32)
    tgt_cls = tgt_cls.at[batch_idx, assign].set(
        jnp.where(targets.valid, targets.labels, num_classes)
    )[:, :q]
    onehot = jax.nn.one_hot(tgt_cls, c1, dtype=jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    empty_weight = jnp.concatenate([jnp.ones((num_classes,)), jnp.array([cfg.criterion_eos_coef])])
    w = empty_weight[tgt_cls]
    nll = -jnp.sum(onehot * log_probs, axis=-1)
    loss_ce = jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), 1e-6)

    # --- mask losses on matched pairs (reference loss_masks :465-527)
    flat_masks = jnp.concatenate([masks, jnp.zeros((b, 1, hm, wm), masks.dtype)], axis=1)
    src = jnp.take_along_axis(flat_masks, assign[..., None, None], axis=1)  # [B, N, Hm, Wm]
    src = src.reshape(b * n, hm, wm).astype(jnp.float32)
    tgt = targets.masks.reshape(b * n, hm, wm).astype(jnp.float32)
    valid = targets.valid.reshape(b * n).astype(jnp.float32)

    coords = uncertainty_sampled_coords(
        r_pts, jax.lax.stop_gradient(src), cfg.criterion_num_points, 3.0, 0.75
    )
    src_pts = point_sample(src, coords)  # [M, P]
    tgt_pts = jax.lax.stop_gradient(point_sample(tgt, coords))

    # sigmoid CE, per-pair mean over points → sum / num_masks
    bce = jax.nn.softplus(-src_pts) * tgt_pts + jax.nn.softplus(src_pts) * (1.0 - tgt_pts)
    loss_mask = jnp.sum(jnp.mean(bce, axis=-1) * valid) / num_masks

    o = jax.nn.sigmoid(src_pts)
    num = 2.0 * jnp.sum(o * tgt_pts, axis=-1)
    den = jnp.sum(o, axis=-1) + jnp.sum(tgt_pts, axis=-1)
    dice = 1.0 - (num + 1.0) / (den + 1.0)
    loss_dice = jnp.sum(dice * valid) / num_masks

    return {"loss_ce": loss_ce, "loss_mask": loss_mask, "loss_dice": loss_dice}


def maskformer_criterion(
    rng: jnp.ndarray,
    aux: MaskFormerAuxOutputs,
    targets: MaskFormerTargets,
    cfg: MaskFormerConfig,
) -> Dict[str, jnp.ndarray]:
    """Full deep-supervision criterion (reference SetCriterion.forward :552-608)."""
    num_masks = jnp.maximum(jnp.sum(targets.valid.astype(jnp.float32)), 1.0)
    num_layers = aux.logits.shape[0]

    weights = {
        "loss_ce": cfg.weight_dict_loss_ce,
        "loss_mask": cfg.weight_dict_loss_mask,
        "loss_dice": cfg.weight_dict_loss_dice,
    }
    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0
    rngs = jax.random.split(rng, num_layers)
    for li in range(num_layers):
        layer = _layer_losses(rngs[li], aux.logits[li], aux.masks[li], targets, num_masks, cfg)
        is_last = li == num_layers - 1
        for k, v in layer.items():
            v = v * weights[k]
            if is_last:
                losses[k] = v
            elif cfg.criterion_deep_supervision:
                losses[f"{k}_{li}"] = v
            if is_last or cfg.criterion_deep_supervision:
                total = total + v
    losses["total"] = total
    return losses


def make_loss_fn(module, cfg: MaskFormerConfig):
    """Pure per-step loss closure for build_train_step."""

    def loss_fn(variables, batch, rng):
        images, targets = batch
        rng_drop, rng_pts = jax.random.split(rng)
        (out, aux_out), new_model_state = module.apply(
            variables, images, train=True, mutable=["batch_stats"], rngs={"dropout": rng_drop}
        )
        losses = maskformer_criterion(rng_pts, aux_out, targets, cfg)
        total = losses.pop("total")
        return total, (losses, new_model_state)

    return loss_fn
