"""STDC backbone (nano/small/large) in flax/NHWC.

Re-derivation of the reference STDC (focoos/nn/backbone/stdc.py): two stride-2
ConvX stems, then Cat/Add bottlenecks with halving channel splits and a
depthwise-conv "avd" downsample. Same computation graph → pretrained torch
weights port 1:1; NHWC layout for TPU convs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.layers.common import _BandedConv3x3, bn_use_running, stem_banded_auto
from focoos_tpu.nn.backbone.base import BackboneConfig, BaseBackbone, ShapeSpec

PRETRAINED_URLS = {
    "small": "https://public.focoos.ai/pretrained_models/backbones/stdc_small.pth",
    "large": "https://public.focoos.ai/pretrained_models/backbones/stdc_large.pth",
    "nano": "https://public.focoos.ai/pretrained_models/backbones/stdc_nano.pth",
}

SIZE_PRESETS = {
    "small": dict(layers=[2, 2, 2], base=64, block_num=4, block_type="cat"),
    "large": dict(layers=[4, 5, 3], base=64, block_num=4, block_type="cat"),
    "nano": dict(layers=[2, 2, 2], base=32, block_num=4, block_type="cat"),
}


@dataclass
class STDCConfig(BackboneConfig):
    model_type: str = "stdc"
    in_chans: int = 3
    base: int = 64
    layers: List[int] = field(default_factory=lambda: [4, 5, 3])
    out_features: List[str] = field(default_factory=lambda: ["res2", "res3", "res4", "res5"])
    block_num: int = 4
    block_type: str = "cat"
    size: Optional[str] = None
    use_conv_last: bool = False
    # banded matmul for the C=3 stem conv (features_0) — see
    # _BandedConv3x3 / docs/tpu_design.md "Banded stem". None = auto (ON for
    # TPU inference traces); env override FOCOOS_STEM_BANDED=0/1.
    stem_banded: Optional[bool] = None

    def resolved(self) -> dict:
        if self.size is not None:
            return SIZE_PRESETS[self.size]
        return dict(layers=self.layers, base=self.base, block_num=self.block_num, block_type=self.block_type)


class ConvX(nn.Module):
    out_planes: int
    kernel: int = 3
    stride: int = 1
    # route through _BandedConv3x3 (implicit im2col on the MXU — the
    # lane-starved C=3 stem fix, docs/tpu_design.md "Banded stem")
    banded: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.kernel // 2
        if self.banded and self.kernel == 3 and self.stride in (1, 2):
            x = _BandedConv3x3(self.out_planes, stride=self.stride, dtype=self.dtype, name="conv")(x)
        else:
            x = nn.Conv(self.out_planes, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                        padding=[(p, p), (p, p)], use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _block_channels(out_planes: int, block_num: int) -> List[int]:
    """Per-sub-conv output channels of a Cat/Add bottleneck."""
    chans = []
    for idx in range(block_num):
        if idx == 0:
            chans.append(out_planes // 2)
        elif idx == 1 and block_num == 2:
            chans.append(out_planes // 2)
        elif idx == 1 and block_num > 2:
            chans.append(out_planes // 4)
        elif idx < block_num - 1:
            chans.append(out_planes // (2 ** (idx + 1)))
        else:
            chans.append(out_planes // (2 ** idx))
    return chans


class CatBottleneck(nn.Module):
    """STDC cat bottleneck (reference: stdc.py:109-172)."""

    out_planes: int
    block_num: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chans = _block_channels(self.out_planes, self.block_num)
        out1 = ConvX(chans[0], kernel=1, dtype=self.dtype, name="conv_list_0")(x, train)

        outs = []
        out = out1
        for idx in range(1, self.block_num):
            if idx == 1 and self.stride == 2:
                # depthwise stride-2 "avd" on the half-width branch
                half = self.out_planes // 2
                d = nn.Conv(half, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], feature_group_count=half,
                            use_bias=False, dtype=self.dtype, name="avd_conv")(out)
                d = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 name="avd_bn")(d)
                out = ConvX(chans[idx], stride=1, dtype=self.dtype, name=f"conv_list_{idx}")(d, train)
            else:
                out = ConvX(chans[idx], stride=1, dtype=self.dtype, name=f"conv_list_{idx}")(out, train)
            outs.append(out)

        if self.stride == 2:
            # torch AvgPool2d(3, 2, 1) default count_include_pad=True
            out1 = nn.avg_pool(out1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        return jnp.concatenate([out1] + outs, axis=-1)


class AddBottleneck(nn.Module):
    """STDC add bottleneck (reference: stdc.py:34-106)."""

    out_planes: int
    block_num: int = 3
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        chans = _block_channels(self.out_planes, self.block_num)
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype, name=name
        )
        outs = []
        out = x
        for idx in range(self.block_num):
            out = ConvX(chans[idx], kernel=1 if idx == 0 else 3, stride=1, dtype=self.dtype,
                        name=f"conv_list_{idx}")(out, train)
            if idx == 0 and self.stride == 2:
                half = self.out_planes // 2
                out = nn.Conv(half, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], feature_group_count=half,
                              use_bias=False, dtype=self.dtype, name="avd_conv")(out)
                out = bn("avd_bn")(out)
            outs.append(out)

        if self.stride == 2:
            cin = x.shape[-1]
            skip = nn.Conv(cin, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)], feature_group_count=cin,
                           use_bias=False, dtype=self.dtype, name="skip_dw")(x)
            skip = bn("skip_dw_bn")(skip)
            skip = nn.Conv(self.out_planes, (1, 1), use_bias=False, dtype=self.dtype, name="skip_pw")(skip)
            skip = bn("skip_pw_bn")(skip)
            x = skip
        return jnp.concatenate(outs, axis=-1) + x


class STDC(BaseBackbone):
    config: STDCConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        r = self.config.resolved()
        base, layers, block_num = r["base"], r["layers"], r["block_num"]
        block_cls = CatBottleneck if r["block_type"] == "cat" else AddBottleneck
        dtype = x.dtype

        out_ids = (1, 3, 5, 7) if layers == [2, 2, 2] else (1, 5, 10, 13)

        feats = []
        banded = stem_banded_auto(train, self.config.stem_banded)
        x = ConvX(base // 2, 3, 2, banded=banded, dtype=dtype, name="features_0")(x, train)
        feats.append(x)
        x = ConvX(base, 3, 2, dtype=dtype, name="features_1")(x, train)
        feats.append(x)
        li = 2
        for i, layer in enumerate(layers):
            for j in range(layer):
                out_planes = base * (2 ** (i + 2))
                x = block_cls(out_planes, block_num, stride=2 if j == 0 else 1, dtype=dtype,
                              name=f"features_{li}")(x, train)
                feats.append(x)
                li += 1

        outs = [feats[i] for i in out_ids]
        return {f"res{i + 2}": outs[i] for i in range(4)}

    def output_shape(self) -> Dict[str, ShapeSpec]:
        base = self.config.resolved()["base"]
        channels = {"res2": base, "res3": base * 4, "res4": base * 8, "res5": base * 16}
        strides = {"res2": 4, "res3": 8, "res4": 16, "res5": 32}
        return {k: ShapeSpec(channels=channels[k], stride=strides[k]) for k in self.config.out_features}


def _register_backbone():
    from focoos_tpu.model_manager import BackboneManager

    BackboneManager.register("stdc", STDCConfig, STDC)


_register_backbone()
