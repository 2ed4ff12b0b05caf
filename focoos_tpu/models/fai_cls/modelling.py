"""fai_cls — backbone + pooled classifier head (reference: focoos/models/fai_cls/modelling.py).

Normalization runs inside the traced graph (the reference does it in the
processor — same math, fused on-device here).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.models.fai_cls.config import ClassificationConfig
from focoos_tpu.models.fai_cls.ports import ClassificationModelOutput
from focoos_tpu.nn.backbone.base import BaseBackbone


class ClassificationHead(nn.Module):
    """GAP → (1x1 conv stack) head (reference: fai_cls/modelling.py:16-79).

    ``dense_prediction`` pools with max AFTER the classifier instead of
    averaging before it.
    """

    hidden_dim: int
    num_classes: int
    num_layers: int = 1
    dropout_rate: float = 0.0
    dense_prediction: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if not self.dense_prediction:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        if self.num_layers == 2:
            x = nn.Conv(self.hidden_dim, (1, 1), dtype=self.dtype, name="fc1")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="fc2")(x)
        elif self.num_layers == 1:
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
            x = nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="fc1")(x)
        else:
            raise ValueError(f"Invalid number of layers: {self.num_layers}")
        if self.dense_prediction:
            x = jnp.max(x, axis=(1, 2), keepdims=True)  # AdaptiveMaxPool2d(1)
        return x.reshape(x.shape[0], -1)


class FAIClassification(nn.Module):
    config: ClassificationConfig
    backbone: BaseBackbone
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.astype(self.dtype or jnp.float32)

        feats = self.backbone(x, train=train)
        fmap = feats[cfg.features]
        logits = ClassificationHead(
            hidden_dim=cfg.hidden_dim,
            num_classes=cfg.num_classes,
            num_layers=cfg.num_layers,
            dropout_rate=cfg.dropout_rate,
            dense_prediction=cfg.dense_prediction,
            dtype=self.dtype,
            name="cls_head",
        )(fmap, train)
        return ClassificationModelOutput(logits=logits.astype(jnp.float32), loss=None), None
