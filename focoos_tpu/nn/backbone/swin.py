"""Swin Transformer backbone (tiny/small/base/large) in flax/NHWC
(reference: focoos/nn/backbone/swin.py — the detectron2 dense-prediction
variant: per-stage output norms, padding-tolerant shifted windows,
PatchMerging at stage end)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from focoos_tpu.nn.backbone.base import BackboneConfig, BaseBackbone, ShapeSpec

SWIN_CONFIGS = {
    "tiny": dict(embed_dims=96, depths=[2, 2, 6, 2], heads=[3, 6, 12, 24], w_size=7),
    "small": dict(embed_dims=96, depths=[2, 2, 18, 2], heads=[3, 6, 12, 24], w_size=7),
    "base": dict(embed_dims=128, depths=[2, 2, 18, 2], heads=[4, 8, 16, 32], w_size=12),
    "large": dict(embed_dims=192, depths=[2, 2, 18, 2], heads=[6, 12, 24, 48], w_size=12),
}

PRETRAINED_URLS = {s: f"https://public.focoos.ai/pretrained_models/backbones/swin_{s}.pth" for s in SWIN_CONFIGS}


@dataclass
class SwinConfig(BackboneConfig):
    model_type: str = "swin"
    model_size: Optional[str] = "tiny"
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    out_indices: Tuple[int, ...] = (0, 1, 2, 3)
    frozen_stages: int = -1
    # jax.checkpoint each block: recompute activations in backward for a
    # large memory cut (identical numerics) — see ResnetConfig.remat
    remat: bool = False

    def resolved(self) -> dict:
        if self.model_size:
            c = SWIN_CONFIGS[self.model_size]
            return dict(embed_dim=c["embed_dims"], depths=c["depths"], num_heads=c["heads"],
                        window_size=c["w_size"])
        return dict(embed_dim=self.embed_dim, depths=list(self.depths), num_heads=list(self.num_heads),
                    window_size=self.window_size)


def _rel_pos_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij")).reshape(2, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # [w², w²]


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (reference :79-171)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        b_, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b_, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd**-0.5), k)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size))
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, h, n, n) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


def _window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def _window_reverse(wins: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    b = wins.shape[0] // (h // ws * (w // ws))
    x = wins.reshape(b, h // ws, w // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """(0/-100) mask [nW, ws², ws²] for shifted windows (reference :243-266)."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = cnt
            cnt += 1
    wins = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    mask = wins[:, None, :] - wins[:, :, None]
    return np.where(mask != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    """(reference SwinTransformerBlock :175-297)"""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: int, w: int, train: bool = False) -> jnp.ndarray:
        from focoos_tpu.nn.layers.misc import DropPath
        b, l, c = x.shape
        # reference never clamps: features pad up to window multiples (:255-260)
        ws = self.window_size
        shift = self.shift_size

        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, h, w, c)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        wins = _window_partition(x, ws)
        wins = WindowAttention(self.dim, ws, self.num_heads, self.qkv_bias, dtype=self.dtype, name="attn")(
            wins, mask
        )
        x = _window_reverse(wins, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, l, c)
        # stochastic depth on both residual branches (reference :238,297)
        dp = DropPath(self.drop_rate, name="drop_path")
        x = shortcut + dp(x, deterministic=not train)

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic=not train)


class Swin(BaseBackbone):
    config: SwinConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        r = self.config.resolved()
        embed_dim, depths, num_heads, ws = r["embed_dim"], r["depths"], r["num_heads"], r["window_size"]
        dtype = x.dtype
        p = cfg.patch_size

        # patch embed (pads to multiple of patch_size)
        b, h0, w0, _ = x.shape
        pad_b = (p - h0 % p) % p
        pad_r = (p - w0 % p) % p
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(embed_dim, (p, p), strides=(p, p), padding='VALID', dtype=dtype, name="patch_embed_proj")(x)
        if cfg.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, name="patch_embed_norm")(x)
        hh,ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh * ww, embed_dim)

        outs = {}
        dim = embed_dim
        # linearly-increasing stochastic-depth rates (reference :600 linspace)
        total = sum(depths)
        rates = [cfg.drop_path_rate * k / max(total - 1, 1) for k in range(total)]
        blk = 0
        # h/w/train are python statics (argnums count self as 0)
        block_ctor = nn.remat(SwinBlock, static_argnums=(2, 3, 4)) if cfg.remat else SwinBlock
        for i, depth in enumerate(depths):
            for j in range(depth):
                x = block_ctor(
                    dim=dim, num_heads=num_heads[i], window_size=ws,
                    shift_size=0 if j % 2 == 0 else ws // 2,
                    mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                    drop_rate=rates[blk], dtype=dtype,
                    name=f"layers_{i}_blocks_{j}",
                )(x, hh, ww, train)
                blk += 1
            if i in cfg.out_indices:
                xo = nn.LayerNorm(epsilon=1e-5, name=f"norm{i}")(x)
                outs[f"res{i + 2}"] = xo.reshape(b, hh, ww, dim)
            if i < len(depths) - 1:
                # PatchMerging (reference :299-340)
                xm = x.reshape(b, hh, ww, dim)
                if hh % 2 or ww % 2:
                    xm = jnp.pad(xm, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
                x0 = xm[:, 0::2, 0::2]
                x1 = xm[:, 1::2, 0::2]
                x2 = xm[:, 0::2, 1::2]
                x3 = xm[:, 1::2, 1::2]
                xm = jnp.concatenate([x0, x1, x2, x3], axis=-1)
                hh, ww = xm.shape[1], xm.shape[2]
                xm = xm.reshape(b, hh * ww, 4 * dim)
                xm = nn.LayerNorm(epsilon=1e-5, name=f"layers_{i}_downsample_norm")(xm)
                x = nn.Dense(2 * dim, use_bias=False, dtype=dtype, name=f"layers_{i}_downsample_reduction")(xm)
                dim *= 2
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        r = self.config.resolved()
        e = r["embed_dim"]
        return {f"res{i + 2}": ShapeSpec(channels=e * 2**i, stride=4 * 2**i) for i in range(4)}

    @property
    def size_divisibility(self) -> int:
        return 32


def _register_backbone():
    from focoos_tpu.model_manager import BackboneManager

    BackboneManager.register("swin", SwinConfig, Swin)


_register_backbone()
