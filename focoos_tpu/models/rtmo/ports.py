"""rtmo output/target pytrees (reference: focoos/models/rtmo/ports.py).

All arrays are static [B, D, ...] with suppressed slots carrying score 0
(``valid = scores > 0``) — the TPU-friendly analog of the reference's ragged
post-NMS lists.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from focoos_tpu.ports import ModelOutput


@struct.dataclass
class RTMOModelOutput(ModelOutput):
    scores: jnp.ndarray  # [B, D]
    labels: jnp.ndarray  # [B, D]
    boxes: jnp.ndarray  # [B, D, 4] xyxy abs (input-res pixels)
    boxes_scores: jnp.ndarray  # [B, D]
    keypoints: jnp.ndarray  # [B, D, K, 2] abs pixels
    keypoints_scores: jnp.ndarray  # [B, D, K]
    keypoints_visible: jnp.ndarray  # [B, D, K]
    loss: Optional[dict] = None


@struct.dataclass
class RTMOAuxOutputs:
    """Raw flattened per-anchor predictions for the criterion."""

    cls_scores: jnp.ndarray  # [B, A, C] raw
    bbox_preds: jnp.ndarray  # [B, A, 4] raw (dx, dy, logw, logh)
    kpt_offsets: jnp.ndarray  # [B, A, K*2] raw
    kpt_vis: jnp.ndarray  # [B, A, K] raw
    pose_feats: jnp.ndarray  # [B, A, C_pose]
    priors: jnp.ndarray  # [A, 2]
    strides: jnp.ndarray  # [A]


@struct.dataclass
class KeypointTargets:
    """Padded GT: labels [B, N], boxes [B, N, 4] xyxy abs, keypoints
    [B, N, K, 2] abs, visibility [B, N, K], areas [B, N], valid [B, N]."""

    labels: jnp.ndarray
    boxes: jnp.ndarray
    keypoints: jnp.ndarray
    keypoints_visible: jnp.ndarray
    areas: jnp.ndarray
    valid: jnp.ndarray
