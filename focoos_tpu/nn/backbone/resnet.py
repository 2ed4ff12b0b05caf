"""ResNet-{18,34,50,101} (variants a/b/c/d) in flax/NHWC.

Re-derivation of the reference backbone (focoos/nn/backbone/resnet.py) for
TPU: identical computation graph (ResNet-D deep stem, avg-pool downsample
shortcuts) so pretrained torch weights port 1:1, but NHWC layout and
XLA-fused conv+BN+act.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.nn.backbone.base import BackboneConfig, BaseBackbone, ShapeSpec
from focoos_tpu.nn.layers.common import ConvNorm, get_activation, stem_banded_auto

RESNET_DEPTH_BLOCKS = {18: [2, 2, 2, 2], 34: [3, 4, 6, 3], 50: [3, 4, 6, 3], 101: [3, 4, 23, 3]}

PRETRAINED_URLS = {
    18: "https://public.focoos.ai/pretrained_models/backbones/resnet18.pth",
    34: "https://public.focoos.ai/pretrained_models/backbones/resnet34.pth",
    50: "https://public.focoos.ai/pretrained_models/backbones/resnet50.pth",
    101: "https://public.focoos.ai/pretrained_models/backbones/resnet101.pth",
}


@dataclass
class ResnetConfig(BackboneConfig):
    model_type: str = "resnet"
    in_chans: int = 3
    depth: int = 50
    variant: str = "d"
    freeze_at: int = -1
    num_stages: int = 4
    freeze_norm: bool = True
    act: str = "relu"
    pretrained: bool = False
    # execute the stem's stride-2 conv as space-to-depth + 2x2 conv — the
    # classic TPU stem optimization (3 input channels use 3 of 128 MXU lanes;
    # s2d packs 2x2 blocks into 12 channels and quarters the spatial extent).
    # Same parameters, exact to fp rounding; see _S2DConv3x3s2.
    space_to_depth: bool = False
    # execute the stem's stride-2 conv as a phase-packed 5x5/s4 conv +
    # depth-to-space (N = 4*32 = 128 output lanes instead of 32, K = 75
    # instead of 27) — see _PhasePackConv3x3s2. Same parameters, exact to fp
    # rounding; falls back to the plain conv when H/W % 4 != 0.
    # Default OFF: measured a net LOSS on v5e (fai-detr-l b16@640 device-op
    # 34.7 -> 37.7 ms) — the conv itself wins (1.29 -> 1.00 ms) but XLA
    # routes the depth-to-space through f32 relayouts (2.65 ms) and the
    # following conv's input loses its packed-bf16 layout. The stem is
    # floor-bounded by the lane-hostile C=3 input reads either way; see
    # docs/tpu_design.md "Phase-packed stem".
    stem_phase_pack: bool = False
    # execute the stem 3x3 convs as block-banded matmuls over the flattened
    # (W, C) lane axis (implicit im2col on the MXU, no input relayout) — see
    # _BandedConv3x3 and docs/tpu_design.md "Banded stem". None = auto: ON
    # for inference when tracing for TPU, OFF for training and other
    # backends. Same parameters; matches the plain conv to accumulation-
    # order rounding. Env override: FOCOOS_STEM_BANDED=0/1.
    stem_banded: Optional[bool] = None
    # jax.checkpoint each residual block: activations are recomputed in the
    # backward pass instead of stored — trades ~30% extra FLOPs for a large
    # activation-memory cut, enabling bigger per-chip batches (HBM is the
    # usual TPU bottleneck). Numerics are identical.
    remat: bool = False


def _avg_pool_2x2_ceil(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(2, 2, ceil_mode=True) over NHWC."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        ones = jnp.pad(jnp.ones((1, h, w, 1), x.dtype), ((0, 0), (0, ph), (0, pw), (0, 0)))
        s = nn.avg_pool(x, (2, 2), strides=(2, 2))
        cnt = nn.avg_pool(ones, (2, 2), strides=(2, 2))
        return s / cnt
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class BasicBlock(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    act: str = "relu"
    variant: str = "b"
    norm: str = "BN"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        out = ConvNorm(self.ch_out, 3, self.stride, act=self.act, norm=self.norm, dtype=self.dtype, name="branch2a")(
            x, train
        )
        out = ConvNorm(self.ch_out, 3, 1, act=None, norm=self.norm, dtype=self.dtype, name="branch2b")(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_2x2_ceil(x)
            short = ConvNorm(self.ch_out, 1, 1, norm=self.norm, dtype=self.dtype, name="short_conv")(short, train)
        else:
            short = ConvNorm(self.ch_out, 1, self.stride, norm=self.norm, dtype=self.dtype, name="short")(x, train)
        return get_activation(self.act)(out + short)


class BottleNeck(nn.Module):
    ch_out: int
    stride: int
    shortcut: bool
    act: str = "relu"
    variant: str = "b"
    norm: str = "BN"
    dtype: Optional[jnp.dtype] = None

    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        stride1, stride2 = (self.stride, 1) if self.variant == "a" else (1, self.stride)
        width = self.ch_out
        out = ConvNorm(width, 1, stride1, act=self.act, norm=self.norm, dtype=self.dtype, name="branch2a")(x, train)
        out = ConvNorm(width, 3, stride2, act=self.act, norm=self.norm, dtype=self.dtype, name="branch2b")(out, train)
        out = ConvNorm(width * self.expansion, 1, 1, norm=self.norm, dtype=self.dtype, name="branch2c")(out, train)
        if self.shortcut:
            short = x
        elif self.variant == "d" and self.stride == 2:
            short = _avg_pool_2x2_ceil(x)
            short = ConvNorm(width * self.expansion, 1, 1, norm=self.norm, dtype=self.dtype, name="short_conv")(
                short, train
            )
        else:
            short = ConvNorm(width * self.expansion, 1, self.stride, norm=self.norm, dtype=self.dtype, name="short")(
                x, train
            )
        return get_activation(self.act)(out + short)


class ResNet(BaseBackbone):
    config: ResnetConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        norm = "FrozenBN" if cfg.freeze_norm else "BN"
        dtype = x.dtype

        banded = stem_banded_auto(train, cfg.stem_banded)

        # stem: deep 3x3 stack for variants c/d, single 7x7 otherwise
        if cfg.variant in ("c", "d"):
            x = ConvNorm(32, 3, 2, act=cfg.act, norm=norm, s2d=cfg.space_to_depth,
                     phase_pack=cfg.stem_phase_pack and not cfg.space_to_depth,
                     banded=banded and not (cfg.space_to_depth or cfg.stem_phase_pack),
                     dtype=dtype, name="conv1_1")(x, train)
            # conv1_2/1_3 banding is a separate experiment knob: the C=32
            # stride-1 windows materialize ~3x the activation in HBM (each
            # kh row-set is its own im2col copy), so the win is not a given.
            banded_all = banded and os.environ.get("FOCOOS_STEM_BANDED_ALL", "0") not in ("0", "false", "")
            x = ConvNorm(32, 3, 1, act=cfg.act, norm=norm, banded=banded_all, dtype=dtype, name="conv1_2")(x, train)
            x = ConvNorm(64, 3, 1, act=cfg.act, norm=norm, banded=banded_all, dtype=dtype, name="conv1_3")(x, train)
        else:
            x = ConvNorm(64, 7, 2, act=cfg.act, norm=norm, dtype=dtype, name="conv1_1")(x, train)
        # max_pool2d(3, 2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        block_cls = BottleNeck if cfg.depth >= 50 else BasicBlock
        if cfg.remat:
            # static_argnums: `train` (arg 1 after x) must stay a Python bool
            block_cls = nn.remat(block_cls, static_argnums=(2,))
        block_nums = RESNET_DEPTH_BLOCKS[cfg.depth]
        outs = {}
        for stage_idx in range(cfg.num_stages):
            ch_out = [64, 128, 256, 512][stage_idx]
            for blk_idx in range(block_nums[stage_idx]):
                x = block_cls(
                    ch_out=ch_out,
                    stride=2 if blk_idx == 0 and stage_idx > 0 else 1,
                    shortcut=blk_idx != 0,
                    act=cfg.act,
                    variant=cfg.variant,
                    norm=norm,
                    dtype=dtype,
                    name=f"res{stage_idx + 2}_block{blk_idx}",
                )(x, train)
            outs[f"res{stage_idx + 2}"] = x
        return outs

    def output_shape(self) -> Dict[str, ShapeSpec]:
        expansion = 4 if self.config.depth >= 50 else 1
        channels = [expansion * c for c in [64, 128, 256, 512]]
        strides = [4, 8, 16, 32]
        return {
            f"res{i + 2}": ShapeSpec(channels=channels[i], stride=strides[i])
            for i in range(self.config.num_stages)
        }


def _register_backbone():
    from focoos_tpu.model_manager import BackboneManager

    BackboneManager.register("resnet", ResnetConfig, ResNet)


_register_backbone()
