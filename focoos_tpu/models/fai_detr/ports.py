"""fai_detr output/target pytrees (reference: focoos/models/fai_detr/ports.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from focoos_tpu.ports import ModelOutput


@struct.dataclass
class DETRModelOutput(ModelOutput):
    """Inference output: boxes [B, Q, 4] xyxy normalized to [0,1];
    logits [B, Q, C] sigmoided scores. Registered pytree → flows through jit."""

    boxes: jnp.ndarray
    logits: jnp.ndarray
    loss: Optional[dict] = None


@struct.dataclass
class DETRAuxOutputs:
    """Training-time raw decoder outputs for the criterion.

    ``dec_logits``/``dec_boxes`` are stacked over decoder layers
    [L, B, Q, ...] (boxes in cxcywh, logits pre-sigmoid); ``enc_logits``/
    ``enc_boxes`` are the encoder top-k selection head outputs.
    """

    dec_logits: jnp.ndarray  # [L, B, Q, C]
    dec_boxes: jnp.ndarray  # [L, B, Q, 4] cxcywh
    enc_logits: jnp.ndarray  # [B, Q, C]
    enc_boxes: jnp.ndarray  # [B, Q, 4] cxcywh (sigmoided)


@struct.dataclass
class DETRTargets:
    """Padded, batched targets: labels [B, N] int32 (num_classes = padding),
    boxes [B, N, 4] normalized cxcywh, valid [B, N] bool mask."""

    labels: jnp.ndarray
    boxes: jnp.ndarray
    valid: jnp.ndarray
