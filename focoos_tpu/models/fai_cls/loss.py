"""fai_cls loss (reference: focoos/models/fai_cls/modelling.py:80-150 ClassificationLoss)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from focoos_tpu.models.fai_cls.config import ClassificationConfig
from focoos_tpu.models.fai_cls.ports import ClassificationTargets


def classification_loss(logits: jnp.ndarray, targets: ClassificationTargets, cfg: ClassificationConfig):
    logits = logits.astype(jnp.float32)
    t = targets.labels.astype(jnp.float32)
    if cfg.use_focal_loss:
        if cfg.label_smoothing > 0:
            t = t * (1 - cfg.label_smoothing) + cfg.label_smoothing / cfg.num_classes
        p = jnp.clip(jax.nn.sigmoid(logits), 1e-6, 1.0)
        loss = -cfg.focal_alpha * jnp.power(1 - p, cfg.focal_gamma) * (
            t * jnp.log(p) + (1 - t) * jnp.log1p(-p)
        )
        loss = jnp.mean(jnp.sum(loss, axis=1))
    else:
        # BCEWithLogitsLoss(pos_weight=w): mean over all elements with
        # positive terms scaled by pos_weight
        log_p = jax.nn.log_sigmoid(logits)
        log_np = jax.nn.log_sigmoid(-logits)
        loss = -(cfg.pos_weight * t * log_p + (1 - t) * log_np)
        loss = jnp.mean(loss)
    return {"loss_cls": loss}


def make_loss_fn(module, cfg: ClassificationConfig):
    def loss_fn(variables, batch, rng):
        images, targets = batch
        (out, _), new_model_state = module.apply(
            variables, images, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
        )
        losses = classification_loss(out.logits, targets, cfg)
        total = losses["loss_cls"]
        return total, (dict(losses), new_model_state)

    return loss_fn
