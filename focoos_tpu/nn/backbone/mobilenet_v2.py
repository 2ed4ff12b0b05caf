"""MobileNetV2 backbone in flax/NHWC (reference: focoos/nn/backbone/mobilenet_v2.py)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.layers.common import bn_use_running
from focoos_tpu.nn.backbone.base import BackboneConfig, BaseBackbone, ShapeSpec

ARCH_SETTINGS = [
    # expand_ratio, channel, num_blocks
    [1, 16, 1],
    [6, 24, 2],
    [6, 32, 3],
    [6, 64, 4],
    [6, 96, 3],
    [6, 160, 3],
    [6, 320, 1],
]

LAYER_TO_RES = {2: "res2", 3: "res3", 5: "res4", 7: "res5"}


@dataclass
class MobileNetV2Config(BackboneConfig):
    model_type: str = "mobilenet_v2"
    in_chans: int = 3
    widen_factor: float = 1.0
    strides: Tuple[int, ...] = (1, 2, 2, 2, 1, 2, 1)
    dilations: Tuple[int, ...] = (1, 1, 1, 1, 1, 1, 1)
    frozen_stages: int = -1
    norm: str = "BN"


def _conv_bn_relu6(x, ch, k, stride, groups, dilation, name, train, dtype):
    pad = (k - 1) // 2 * dilation
    x = nn.Conv(ch, (k, k), strides=(stride, stride), padding=[(pad, pad), (pad, pad)],
                feature_group_count=groups, kernel_dilation=(dilation, dilation),
                use_bias=False, dtype=dtype, name=f"{name}_conv")(x)
    x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=dtype,
                     name=f"{name}_bn")(x)
    return jnp.clip(x, 0.0, 6.0)


class InvertedResidual(nn.Module):
    """(reference :16-95)"""

    out_channels: int
    stride: int
    expand_ratio: int
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cin = x.shape[-1]
        hidden = int(round(cin * self.expand_ratio))
        y = x
        if self.expand_ratio != 1:
            y = _conv_bn_relu6(y, hidden, 1, 1, 1, 1, "expand", train, self.dtype)
        y = _conv_bn_relu6(y, hidden, 3, self.stride, hidden, self.dilation, "dw", train, self.dtype)
        # linear projection (no activation, reference has activation on all —
        # note: the reference applies activation on the projection conv too)
        pad = 0
        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="project_conv")(y)
        y = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                         name="project_bn")(y)
        y = jnp.clip(y, 0.0, 6.0)  # reference passes activation to the 1x1 projection too
        if self.stride == 1 and cin == self.out_channels:
            return x + y
        return y


class MobileNetV2(BaseBackbone):
    config: MobileNetV2Config

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        dtype = x.dtype
        ch = int(32 * cfg.widen_factor)
        x = _conv_bn_relu6(x, ch, 3, 2, 1, 1, "conv1", train, dtype)
        outs = {}
        for i, (expand, channel, nblocks) in enumerate(ARCH_SETTINGS):
            out_ch = int(channel * cfg.widen_factor)
            for j in range(nblocks):
                x = InvertedResidual(
                    out_channels=out_ch,
                    stride=cfg.strides[i] if j == 0 else 1,
                    expand_ratio=expand,
                    dilation=cfg.dilations[i] if j == 0 else 1,
                    dtype=dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train)
            if (i + 1) in LAYER_TO_RES:
                outs[LAYER_TO_RES[i + 1]] = x
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        wf = self.config.widen_factor
        return {
            "res2": ShapeSpec(channels=int(24 * wf), stride=4),
            "res3": ShapeSpec(channels=int(32 * wf), stride=8),
            "res4": ShapeSpec(channels=int(96 * wf), stride=16),
            "res5": ShapeSpec(channels=int(320 * wf), stride=32),
        }


def _register_backbone():
    from focoos_tpu.model_manager import BackboneManager

    BackboneManager.register("mobilenet_v2", MobileNetV2Config, MobileNetV2)


_register_backbone()
