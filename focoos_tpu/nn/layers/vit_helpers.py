"""ViT building-block helpers (reference: focoos/nn/layers/mvit.py — window
partitioning, decomposed relative positions, patch embedding; library utilities
not used by the current zoo there either).

NHWC throughout; the window helpers are also what Swin's implementation uses
internally (focoos_tpu/nn/backbone/swin.py keeps its own inlined copies to
preserve parameter scoping)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """[B, H, W, C] → [B*nW, ws, ws, C], padding H/W up to window multiples
    (reference mvit.py:17-38). Returns (windows, padded (Hp, Wp))."""
    b, h, w, c = x.shape
    pad_h = (window_size - h % window_size) % window_size
    pad_w = (window_size - w % window_size) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    x = x.reshape(b, hp // window_size, window_size, wp // window_size, window_size, c)
    wins = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, c)
    return wins, (hp, wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of :func:`window_partition`, cropping the padding back off
    (reference mvit.py:41-61)."""
    hp, wp = pad_hw
    h, w = hw
    b = windows.shape[0] // (hp * wp // window_size // window_size)
    x = windows.reshape(b, hp // window_size, wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative position embeddings for (possibly unequal) q/k lengths,
    bilinearly resized to 2*max(q,k)-1 entries (reference mvit.py:64-94)."""
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(rel_pos, (max_rel_dist, rel_pos.shape[1]), "linear")
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(jnp.int32)]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,  # [B, q_h*q_w, k_h*k_w]
    q: jnp.ndarray,     # [B, q_h*q_w, C]
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_size: Tuple[int, int],
    k_size: Tuple[int, int],
) -> jnp.ndarray:
    """MViT2-style decomposed relative position bias added to attention
    logits (reference mvit.py:97-126)."""
    q_h, q_w = q_size
    k_h, k_w = k_size
    rh = get_rel_pos(q_h, k_h, rel_pos_h)  # [q_h, k_h, C]
    rw = get_rel_pos(q_w, k_w, rel_pos_w)  # [q_w, k_w, C]
    b = q.shape[0]
    r_q = q.reshape(b, q_h, q_w, -1)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, rw)
    attn = attn.reshape(b, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(b, q_h * q_w, k_h * k_w)


def get_abs_pos(abs_pos: jnp.ndarray, has_cls_token: bool, hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize pretrained absolute position embeddings to a new grid
    (reference mvit.py:129-158)."""
    h, w = hw
    if has_cls_token:
        abs_pos = abs_pos[:, 1:]
    n = abs_pos.shape[1]
    size = int(n**0.5)
    assert size * size == n, "absolute position embedding must be square"
    if size != h or size != w:
        grid = abs_pos.reshape(abs_pos.shape[0], size, size, -1)
        grid = jax.image.resize(grid, (abs_pos.shape[0], h, w, grid.shape[-1]), "bicubic")
        return grid
    return abs_pos.reshape(abs_pos.shape[0], h, w, -1)


class PatchEmbed(nn.Module):
    """Image → patch embedding conv (reference mvit.py:161-190)."""

    embed_dim: int = 768
    kernel_size: Tuple[int, int] = (16, 16)
    stride: Tuple[int, int] = (16, 16)
    padding: str = "VALID"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.embed_dim, self.kernel_size, strides=self.stride,
                       padding=self.padding, name="proj")(x)
