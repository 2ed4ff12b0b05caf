"""fai_mf output/target pytrees (reference: focoos/models/fai_mf/ports.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from focoos_tpu.ports import ModelOutput


@struct.dataclass
class MaskFormerModelOutput(ModelOutput):
    """masks [B, Q, H, W] sigmoided (input-res at eval); logits [B, Q, C]
    softmaxed class probabilities without the no-object column."""

    masks: jnp.ndarray
    logits: jnp.ndarray
    loss: Optional[dict] = None


@struct.dataclass
class MaskFormerAuxOutputs:
    """Per-layer raw outputs for the criterion: logits [L+1, B, Q, C+1],
    masks [L+1, B, Q, Hm, Wm] (pre-sigmoid, mask-feature resolution)."""

    logits: jnp.ndarray
    masks: jnp.ndarray


@struct.dataclass
class MaskFormerTargets:
    """Padded targets: labels [B, N] int32, masks [B, N, Hm, Wm] float
    (downsampled to mask-feature res by the processor), valid [B, N] bool."""

    labels: jnp.ndarray
    masks: jnp.ndarray
    valid: jnp.ndarray
