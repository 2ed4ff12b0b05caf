"""Multi-scale deformable attention core for TPU.

Replaces the reference's per-level ``F.grid_sample`` loop
(focoos/nn/layers/deformable.py:10-36) with a fully-vectorized XLA gather
formulation: four bilinear-corner gathers per level via
``jnp.take_along_axis`` over the flattened spatial axis, weight-masked for
``padding_mode="zeros"`` / ``align_corners=False`` parity. All shapes are
static per level, so XLA tiles the arithmetic onto the VPU and fuses the
weighted sum; a Pallas fused-gather kernel can be slotted in behind the same
signature (see focoos_tpu/ops/pallas/msda.py).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def _bilinear_gather_level(
    value_l: jnp.ndarray,  # [B, Hh, S_l, D]  (head-major, flattened spatial)
    loc: jnp.ndarray,  # [B, Lq, Hh, P, 2] normalized (x, y) in [0, 1]
    h: int,
    w: int,
) -> jnp.ndarray:
    """Sample one level bilinearly → [B, Lq, Hh, P, D]."""
    b, lq, hh, p, _ = loc.shape
    d = value_l.shape[-1]

    # align_corners=False pixel centers
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    out = jnp.zeros((b, hh, lq * p, d), dtype=value_l.dtype)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yi = y0 + dy
        y_ok = (yi >= 0) & (yi <= h - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xi = x0 + dx
            ok = y_ok & (xi >= 0) & (xi <= w - 1)
            xi_c = jnp.clip(xi, 0, w - 1)
            wgt = jnp.where(ok, wx * wy, 0.0).astype(value_l.dtype)  # [B, Lq, Hh, P]
            idx = (yi_c * w + xi_c).astype(jnp.int32)  # [B, Lq, Hh, P]
            # → head-major flat query axis for a single gather per corner
            idx_hm = idx.transpose(0, 2, 1, 3).reshape(b, hh, lq * p)
            g = jnp.take_along_axis(value_l, idx_hm[..., None], axis=2)  # [B, Hh, Lq*P, D]
            wgt_hm = wgt.transpose(0, 2, 1, 3).reshape(b, hh, lq * p)
            out = out + g * wgt_hm[..., None]
    return out.reshape(b, hh, lq, p, d).transpose(0, 2, 1, 3, 4)


def ms_deform_attn(
    value: jnp.ndarray,  # [B, S, Hh, D], S = sum(H_l * W_l)
    spatial_shapes: Sequence[Tuple[int, int]],  # static [(H_l, W_l), ...]
    sampling_locations: jnp.ndarray,  # [B, Lq, Hh, L, P, 2] in [0, 1]
    attention_weights: jnp.ndarray,  # [B, Lq, Hh, L, P]
) -> jnp.ndarray:
    """Multi-scale deformable attention → [B, Lq, Hh * D].

    Semantics match ``ms_deform_attn_core_pytorch``
    (focoos/nn/layers/deformable.py:10): bilinear, zeros padding,
    align_corners=False, softmaxed weights already applied by the caller.
    """
    b, s, hh, d = value.shape
    lq = sampling_locations.shape[1]

    # split flattened value per level, head-major
    out = jnp.zeros((b, lq, hh, d), dtype=value.dtype)
    start = 0
    for lid, (h, w) in enumerate(spatial_shapes):
        sl = h * w
        value_l = value[:, start : start + sl].transpose(0, 2, 1, 3)  # [B, Hh, S_l, D]
        start += sl
        sampled = _bilinear_gather_level(value_l, sampling_locations[:, :, :, lid], h, w)
        # weighted sum over sampling points of this level
        w_l = attention_weights[:, :, :, lid].astype(value.dtype)  # [B, Lq, Hh, P]
        out = out + jnp.einsum("blhpd,blhp->blhd", sampled, w_l)
    return out.reshape(b, lq, hh * d)
