"""Normalized-coordinate point sampling (PointRend-style) as pure jax.

Replaces the reference's ``grid_sample``-based ``point_sample`` and
uncertainty-driven point selection (focoos/nn/layers/point_rend.py:29,:73)
with a vectorized bilinear gather — same math as focoos_tpu/ops/deformable.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def point_sample(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample [M, H, W] maps at [M, P, 2] normalized (x, y) coords
    in [0,1]² (align_corners=False, zeros padding) → [M, P]."""
    m, h, w = masks.shape
    p = coords.shape[1]
    x = coords[..., 0] * w - 0.5
    y = coords[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = x - x0
    ty = y - y0

    flat = masks.reshape(m, h * w)
    out = jnp.zeros((m, p), masks.dtype)
    for dy, wy in ((0, 1.0 - ty), (1, ty)):
        yi = y0 + dy
        y_ok = (yi >= 0) & (yi <= h - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        for dx, wx in ((0, 1.0 - tx), (1, tx)):
            xi = x0 + dx
            ok = y_ok & (xi >= 0) & (xi <= w - 1)
            xi_c = jnp.clip(xi, 0, w - 1)
            idx = (yi_c * w + xi_c).astype(jnp.int32)
            g = jnp.take_along_axis(flat, idx, axis=1)
            out = out + g * jnp.where(ok, wx * wy, 0.0).astype(masks.dtype)
    return out


def uncertainty_sampled_coords(
    rng: jnp.ndarray,
    coarse_logits: jnp.ndarray,  # [M, H, W]
    num_points: int,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
) -> jnp.ndarray:
    """PointRend point selection (reference: point_rend.py:73-129):
    oversample uniformly, keep the most-uncertain (|logit| smallest) fraction,
    top up with fresh uniform points → [M, P, 2]."""
    m = coarse_logits.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (m, num_sampled, 2), jnp.float32)
    logits = point_sample(coarse_logits.astype(jnp.float32), coords)
    uncertainty = -jnp.abs(logits)
    n_unc = int(importance_sample_ratio * num_points)
    n_rand = num_points - n_unc
    _, idx = jax.lax.top_k(uncertainty, n_unc)  # [M, n_unc]
    picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    if n_rand > 0:
        extra = jax.random.uniform(r2, (m, n_rand, 2), jnp.float32)
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked
