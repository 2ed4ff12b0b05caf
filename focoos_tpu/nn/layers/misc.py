"""Standalone library layers (reference: focoos/nn/layers/{misc,aspp,dcn,
position_encoding,attention}.py).

None of these are used by the five zoo families in the reference either —
they are public building blocks of the layer library. TPU notes per layer:

- DropPath: per-sample stochastic depth; a single bernoulli broadcast-mul,
  fuses into the preceding op under XLA.
- ASPP: dilated convs map directly onto XLA's conv lowering (dilation is a
  first-class conv parameter, no im2col materialisation).
- DeformableConv2d: bilinear gather over offset grids. Like deformable
  attention (focoos_tpu/ops/deformable.py) the TPU-friendly formulation is
  matmul interpolation rather than scattered gathers, but this layer is not
  on any model's hot path, so a plain vectorised gather keeps it simple.
- Conditional attention: conditional-DETR style content/spatial query
  decomposition (reference attention.py:119,269).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.layers.common import BatchNorm, get_activation, get_norm


def drop_path(
    x: jnp.ndarray, rate: float, deterministic: bool, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Per-sample stochastic depth (reference misc.py:30-46, timm semantics:
    bernoulli keep mask on the batch axis, scaled by 1/keep_prob)."""
    if deterministic or rate == 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class DropPath(nn.Module):
    """Stochastic-depth module (reference misc.py:49-76).

    Degrades to identity when no ``dropout`` rng stream is provided, so
    inference and rng-less training paths are unaffected.
    """

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        if deterministic or self.rate == 0.0 or not self.has_rng("dropout"):
            return x
        return drop_path(x, self.rate, False, self.make_rng("dropout"))


class PositionEmbeddingLearned(nn.Module):
    """Learned row/col position embedding (reference position_encoding.py:90):
    two embedding tables indexed by pixel row/col, concatenated per position."""

    num_pos_feats: int = 256
    max_size: int = 50

    @nn.compact
    def __call__(self, h: int, w: int) -> jnp.ndarray:
        row = self.param("row_embed", nn.initializers.uniform(1.0), (self.max_size, self.num_pos_feats))
        col = self.param("col_embed", nn.initializers.uniform(1.0), (self.max_size, self.num_pos_feats))
        x_emb = col[jnp.arange(w)]  # [W, F]
        y_emb = row[jnp.arange(h)]  # [H, F]
        pos = jnp.concatenate(
            [jnp.broadcast_to(x_emb[None], (h, w, self.num_pos_feats)),
             jnp.broadcast_to(y_emb[:, None], (h, w, self.num_pos_feats))],
            axis=-1,
        )
        return pos  # [H, W, 2F]


def get_sine_pos_embed(
    pos: jnp.ndarray, num_pos_feats: int = 128, temperature: int = 10000, exchange_xy: bool = True
) -> jnp.ndarray:
    """Sine embedding of arbitrary coordinate tensors
    (reference position_encoding.py:155): each scalar coordinate expands to
    ``num_pos_feats`` interleaved sin/cos channels."""
    scale = 2.0 * jnp.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def embed(coord):  # [...,] -> [..., F]
        v = coord * scale / dim_t
        return jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])], axis=-1).reshape(*v.shape[:-1], -1)

    parts = [embed(pos[..., i : i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, NHWC (reference aspp.py:13-142):
    1x1 conv + three dilated 3x3 convs + global-pool image branch, concat,
    1x1 projection, optional dropout."""

    out_channels: int
    dilations: Sequence[int] = (6, 12, 18)
    norm: Optional[str] = "BN"
    activation: str = "relu"
    pool_kernel_size: Optional[Sequence[int]] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        act = get_activation(self.activation)

        def conv_branch(k, dilation, name):
            pad = dilation * (k - 1) // 2
            y = nn.Conv(self.out_channels, (k, k), kernel_dilation=(dilation, dilation),
                        padding=[(pad, pad)] * 2, use_bias=self.norm is None, name=f"{name}_conv")(x)
            norm = get_norm(self.norm, name=f"{name}_norm")
            if norm is not None:
                y = norm(y, train) if isinstance(norm, BatchNorm) else norm(y)
            return act(y)

        branches = [conv_branch(1, 1, "b0")]
        for i, d in enumerate(self.dilations):
            branches.append(conv_branch(3, d, f"b{i + 1}"))

        # image-pooling branch: global (or windowed) average → 1x1 conv → upsample
        if self.pool_kernel_size:
            kh, kw = self.pool_kernel_size
            pooled = nn.avg_pool(x, (kh, kw), strides=(kh, kw))
        else:
            pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = act(nn.Conv(self.out_channels, (1, 1), name="pool_conv")(pooled))
        pooled = jax.image.resize(pooled, (x.shape[0], x.shape[1], x.shape[2], self.out_channels), "bilinear")
        branches.append(pooled)

        y = jnp.concatenate(branches, axis=-1)
        y = act(nn.Conv(self.out_channels, (1, 1), name="project")(y))
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class DeformableConv2d(nn.Module):
    """Deformable conv v2 (reference dcn.py:6): a regular conv predicts per-
    position kernel offsets (+ modulation masks), features are bilinearly
    sampled at the offset taps and contracted against the kernel.

    Static-shape formulation: the K*K taps are materialised as a gather over
    the flattened spatial axis — fine off the hot path; the zoo never calls
    this layer (parity with the reference, where dcn.py is also unused).
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    modulated: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        k = self.kernel_size
        pad = k // 2
        n_off = 2 * k * k + (k * k if self.modulated else 0)
        off = nn.Conv(n_off, (k, k), strides=(self.stride, self.stride),
                      padding=[(pad, pad)] * 2, kernel_init=nn.initializers.zeros,
                      name="offset_conv")(x)
        oh, ow = off.shape[1], off.shape[2]
        offsets = off[..., : 2 * k * k].reshape(b, oh, ow, k * k, 2)
        mask = jax.nn.sigmoid(off[..., 2 * k * k :]) * 2.0 if self.modulated else None

        # base sampling grid: output position * stride + kernel tap - pad
        ys = jnp.arange(oh) * self.stride
        xs = jnp.arange(ow) * self.stride
        ky, kx = jnp.meshgrid(jnp.arange(k) - pad, jnp.arange(k) - pad, indexing="ij")
        taps = jnp.stack([ky.reshape(-1), kx.reshape(-1)], axis=-1).astype(jnp.float32)  # [K2, 2]
        base = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1).astype(jnp.float32)  # [oh,ow,2]
        pos = base[:, :, None, :] + taps[None, None] + offsets  # [b,oh,ow,K2,2]

        y0 = jnp.floor(pos[..., 0])
        x0 = jnp.floor(pos[..., 1])
        dy = pos[..., 0] - y0
        dx = pos[..., 1] - x0

        def gather(yy, xx):
            # zero padding semantics: corners outside the feature map read 0
            inb = (yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1)
            yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
            xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
            flat = x.reshape(b, h * w, c)
            idx = yc * w + xc  # [b,oh,ow,K2]
            vals = jnp.take_along_axis(
                flat[:, :, None, :], idx.reshape(b, -1, 1, 1), axis=1
            ).reshape(b, *idx.shape[1:], c)
            return jnp.where(inb[..., None], vals, 0.0)

        samp = (
            gather(y0, x0) * ((1 - dy) * (1 - dx))[..., None]
            + gather(y0, x0 + 1) * ((1 - dy) * dx)[..., None]
            + gather(y0 + 1, x0) * (dy * (1 - dx))[..., None]
            + gather(y0 + 1, x0 + 1) * (dy * dx)[..., None]
        )
        if mask is not None:
            samp = samp * mask[..., None]
        # contract taps x in-channels against the kernel on the MXU
        kernel = self.param("kernel", nn.initializers.lecun_normal(), (k * k * c, self.features))
        out = samp.reshape(b, oh, ow, k * k * c) @ kernel
        return out + self.param("bias", nn.initializers.zeros, (self.features,))


class ConditionalSelfAttention(nn.Module):
    """Conditional-DETR decoder self-attention (reference attention.py:119):
    separate content/spatial projections for q and k, summed before MHA."""

    embed_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(
        self, query: jnp.ndarray, query_pos: jnp.ndarray, attn_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        q = nn.Dense(self.embed_dim, name="q_content")(query) + nn.Dense(self.embed_dim, name="q_pos")(query_pos)
        k = nn.Dense(self.embed_dim, name="k_content")(query) + nn.Dense(self.embed_dim, name="k_pos")(query_pos)
        v = nn.Dense(self.embed_dim, name="v_proj")(query)
        out = _mha(q, k, v, self.num_heads, attn_mask)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


class ConditionalCrossAttention(nn.Module):
    """Conditional-DETR decoder cross-attention (reference attention.py:269):
    content and spatial query/key streams are concatenated per head, doubling
    the head dim; the spatial stream carries sine-embedded reference points."""

    embed_dim: int
    num_heads: int = 8

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,       # [B, Q, C]
        key: jnp.ndarray,         # [B, L, C]
        value: jnp.ndarray,       # [B, L, C]
        query_sine_embed: jnp.ndarray,  # [B, Q, C]
        key_pos: jnp.ndarray,     # [B, L, C]
    ) -> jnp.ndarray:
        qc = nn.Dense(self.embed_dim, name="q_content")(query)
        qp = nn.Dense(self.embed_dim, name="q_pos")(query_sine_embed)
        kc = nn.Dense(self.embed_dim, name="k_content")(key)
        kp = nn.Dense(self.embed_dim, name="k_pos")(key_pos)
        v = nn.Dense(self.embed_dim, name="v_proj")(value)

        b, q, c = qc.shape
        l = kc.shape[1]
        hd = c // self.num_heads
        # concat content+spatial per head → effective head dim 2*hd
        qf = jnp.concatenate(
            [qc.reshape(b, q, self.num_heads, hd), qp.reshape(b, q, self.num_heads, hd)], axis=-1
        ).reshape(b, q, 2 * c)
        kf = jnp.concatenate(
            [kc.reshape(b, l, self.num_heads, hd), kp.reshape(b, l, self.num_heads, hd)], axis=-1
        ).reshape(b, l, 2 * c)
        out = _mha(qf, kf, v, self.num_heads, None, out_dim=c)
        return nn.Dense(self.embed_dim, name="out_proj")(out)


def _mha(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, num_heads: int,
    attn_mask: Optional[jnp.ndarray], out_dim: Optional[int] = None,
) -> jnp.ndarray:
    b, nq, cq = q.shape
    nl = k.shape[1]
    cv = v.shape[-1]
    hq = cq // num_heads
    hv = cv // num_heads
    qh = q.reshape(b, nq, num_heads, hq).transpose(0, 2, 1, 3)
    kh = k.reshape(b, nl, num_heads, hq).transpose(0, 2, 1, 3)
    vh = v.reshape(b, nl, num_heads, hv).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / jnp.sqrt(hq).astype(q.dtype)
    if attn_mask is not None:
        logits = jnp.where(attn_mask, logits, jnp.finfo(logits.dtype).min)
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh).transpose(0, 2, 1, 3).reshape(b, nq, cv)
    return out
