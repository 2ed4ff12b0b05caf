"""fai_cls output/target pytrees (reference: focoos/models/fai_cls/ports.py)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from focoos_tpu.ports import ModelOutput


@struct.dataclass
class ClassificationModelOutput(ModelOutput):
    logits: jnp.ndarray  # [N, num_classes], raw
    loss: Optional[dict] = None


@struct.dataclass
class ClassificationTargets:
    """One-hot (multi-)labels [B, num_classes] float."""

    labels: jnp.ndarray
