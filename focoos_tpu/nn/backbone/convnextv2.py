"""ConvNeXtV2 backbone (atto..large) in flax/NHWC
(reference: focoos/nn/backbone/convnextv2.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.backbone.base import BackboneConfig, BaseBackbone, ShapeSpec

CONFIGS = {
    "atto": dict(depths=[2, 2, 6, 2], embed_dims=[40, 80, 160, 320]),
    "femto": dict(depths=[2, 2, 6, 2], embed_dims=[48, 96, 192, 384]),
    "pico": dict(depths=[2, 2, 6, 2], embed_dims=[64, 128, 256, 512]),
    "nano": dict(depths=[2, 2, 8, 2], embed_dims=[80, 160, 320, 640]),
    "tiny": dict(depths=[3, 3, 9, 3], embed_dims=[96, 192, 384, 768]),
    "base": dict(depths=[3, 3, 27, 3], embed_dims=[128, 256, 512, 1024]),
    "large": dict(depths=[3, 3, 27, 3], embed_dims=[192, 384, 768, 1536]),
}

PRETRAINED_URLS = {
    s: f"https://public.focoos.ai/pretrained_models/backbones/convnextv2_{s}.pth" for s in CONFIGS
}


@dataclass
class ConvNeXtV2Config(BackboneConfig):
    model_type: str = "convnextv2"
    model_size: Optional[str] = "atto"
    drop_path_rate: float = 0.0
    depths: Optional[Tuple[int, ...]] = None
    embed_dims: Optional[Tuple[int, ...]] = None

    def resolved(self) -> dict:
        if self.model_size:
            return CONFIGS[self.model_size]
        return dict(depths=self.depths, embed_dims=self.embed_dims)


class GRN(nn.Module):
    """Global response normalization (reference :17-28)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return (gamma * (x * nx.astype(x.dtype)) + beta).astype(x.dtype) + x


class Block(nn.Module):
    """dwconv7 → LN → pw(4x) → GELU → GRN → pw (reference :31-62).

    ``drop_rate``: per-block stochastic depth on the residual branch
    (reference :58 drop_path), active only in train mode with a dropout rng.
    """

    dim: int
    drop_rate: float = 0.0
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        from focoos_tpu.nn.layers.misc import DropPath

        inp = x
        x = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)], feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(4 * self.dim, name="grn")(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        return inp + DropPath(self.drop_rate)(x, deterministic=not train)


class ConvNeXtV2(BaseBackbone):
    config: ConvNeXtV2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        r = self.config.resolved()
        depths, dims = r["depths"], r["embed_dims"]
        dtype = x.dtype
        # linearly-increasing stochastic-depth rates (reference :131 linspace)
        total = sum(depths)
        rates = [self.config.drop_path_rate * k / max(total - 1, 1) for k in range(total)]
        blk = 0
        outs = {}
        for i in range(4):
            if i == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), padding='VALID', dtype=dtype, name="downsample_0_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="downsample_0_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_{i}_norm")(x)
                x = nn.Conv(dims[i], (2, 2), strides=(2, 2), padding='VALID', dtype=dtype, name=f"downsample_{i}_conv")(x)
            for j in range(depths[i]):
                x = Block(dims[i], drop_rate=rates[blk], dtype=dtype, name=f"stages_{i}_{j}")(x, train)
                blk += 1
            outs[f"res{i + 2}"] = x
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        dims = self.config.resolved()["embed_dims"]
        return {f"res{i + 2}": ShapeSpec(channels=dims[i], stride=4 * 2**i) for i in range(4)}


def _register_backbone():
    from focoos_tpu.model_manager import BackboneManager

    BackboneManager.register("convnextv2", ConvNeXtV2Config, ConvNeXtV2)


_register_backbone()
