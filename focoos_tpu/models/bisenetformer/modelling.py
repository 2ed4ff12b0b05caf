"""bisenetformer — BiSeNet dual-path + masked query decoder for TPU.

Re-derivation of the reference (focoos/models/bisenetformer/modelling.py):
backbone → ContextPath (ARM attention-refinement over res5/res4 + global avg
context) → FeatureFusionModule over res3 + context → conv mask features;
decoder = the same masked-attention query decoder as fai_mf but over the two
coarsest context maps (reference :355 num_feature_levels = 2).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from focoos_tpu.models.bisenetformer.config import BisenetFormerConfig
from focoos_tpu.models.fai_mf.modelling import MultiScaleMaskedTransformerDecoder
from focoos_tpu.models.fai_mf.ports import MaskFormerModelOutput
from focoos_tpu.nn.backbone.base import BaseBackbone
from focoos_tpu.nn.layers.common import bn_use_running, bilinear_resize

Dtype = jnp.dtype

# bisenetformer shares the MaskFormer output pytrees (same shapes/semantics,
# reference: focoos/models/bisenetformer/ports.py)
BisenetFormerOutput = MaskFormerModelOutput


class ConvBNReLU(nn.Module):
    out_chan: int
    ks: int = 3
    stride: int = 1
    padding: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.out_chan, (self.ks, self.ks), strides=(self.stride, self.stride),
                    padding=[(self.padding, self.padding)] * 2, use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class AttentionRefinementModule(nn.Module):
    """ARM (reference: bisenetformer/modelling.py:149-167)."""

    out_chan: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype, name="proj")(x)
        feat = ConvBNReLU(self.out_chan, dtype=self.dtype, name="conv")(x, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype, name="conv_atten")(atten)
        atten = nn.BatchNorm(use_running_average=bn_use_running(train), momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name="bn_atten")(atten)
        return feat * jax.nn.sigmoid(atten)


class FeatureFusionModule(nn.Module):
    """FFM (reference: bisenetformer/modelling.py:213-235)."""

    out_chan: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, fsp: jnp.ndarray, fcp: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        a = nn.Conv(self.out_chan, (1, 1), dtype=self.dtype, name="proj1")(fsp)
        b = nn.Conv(self.out_chan, (1, 1), dtype=self.dtype, name="proj2")(fcp)
        feat = ConvBNReLU(self.out_chan, ks=1, padding=0, dtype=self.dtype, name="convblk")(a + b, train)
        atten = jnp.mean(feat, axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.out_chan // 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(atten)
        atten = nn.relu(atten)
        atten = nn.Conv(self.out_chan, (1, 1), use_bias=False, dtype=self.dtype, name="conv2")(atten)
        atten = jax.nn.sigmoid(atten)
        return feat * atten + feat


class BiseNet(nn.Module):
    """Context path + FFM pixel decoder (reference: bisenetformer/modelling.py:238-282).

    Returns (mask_features [B,H/8,W/8,out_dim], [cp32, cp16, cp8] NHWC).
    """

    backbone: BaseBackbone
    feat_dim: int = 128
    out_dim: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = self.backbone(images, train=train)
        res3, res4, res5 = feats["res3"], feats["res4"], feats["res5"]

        # ContextPath (reference :170-210)
        avg = jnp.mean(res5, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(self.feat_dim, ks=1, padding=0, dtype=self.dtype, name="cp_conv_avg")(avg, train)
        f32_arm = AttentionRefinementModule(self.feat_dim, dtype=self.dtype, name="cp_arm32")(res5, train)
        f32_sum = f32_arm + avg
        f32_up = bilinear_resize(f32_sum, (res4.shape[1], res4.shape[2]))
        f32_up = ConvBNReLU(self.feat_dim, dtype=self.dtype, name="cp_conv_head32")(f32_up, train)

        f16_arm = AttentionRefinementModule(self.feat_dim, dtype=self.dtype, name="cp_arm16")(res4, train)
        f16_sum = f16_arm + f32_up
        f16_up = bilinear_resize(f16_sum, (res3.shape[1], res3.shape[2]))
        f16_up = ConvBNReLU(self.feat_dim, dtype=self.dtype, name="cp_conv_head16")(f16_up, train)

        f8_sum = f16_up

        fused = FeatureFusionModule(self.feat_dim, dtype=self.dtype, name="ffm")(res3, f8_sum, train)
        mask_features = ConvBNReLU(self.out_dim, dtype=self.dtype, name="conv_out")(fused, train)
        return mask_features, [f32_sum, f16_sum, f8_sum]


class BisenetFormer(nn.Module):
    """BisenetFormer top-level (reference: bisenetformer/modelling.py:534-622)."""

    config: BisenetFormerConfig
    backbone: BaseBackbone
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        cfg = self.config
        mean = jnp.asarray(cfg.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(cfg.pixel_std, dtype=jnp.float32)
        x = (images.astype(jnp.float32) - mean) / std
        x = x.astype(self.dtype or jnp.float32)

        mask_features, ms = BiseNet(
            backbone=self.backbone,
            feat_dim=cfg.pixel_decoder_feat_dim,
            out_dim=cfg.pixel_decoder_out_dim,
            dtype=self.dtype,
            name="pixel_decoder",
        )(x, train)

        # decoder sees the two coarsest context maps (reference :378 x[:-1])
        aux = MultiScaleMaskedTransformerDecoder(
            num_classes=cfg.num_classes,
            hidden_dim=cfg.transformer_predictor_hidden_dim,
            mask_dim=cfg.transformer_predictor_out_dim,
            num_queries=cfg.num_queries,
            nheads=8,
            dec_layers=cfg.transformer_predictor_dec_layers,
            dim_feedforward=cfg.transformer_predictor_dim_feedforward,
            num_scales=2,
            dtype=self.dtype,
            name="predictor",
        )(ms[:2], mask_features, train)

        logits_raw = aux.logits[-1]
        masks_raw = aux.masks[-1]
        if cfg.cls_sigmoid:
            cls_probs = jax.nn.sigmoid(logits_raw)[..., :-1]
        else:
            cls_probs = jax.nn.softmax(logits_raw, axis=-1)[..., :-1]
        masks = jax.nn.sigmoid(masks_raw)
        if not train:
            b, q = masks.shape[:2]
            # Upsample per-query masks to input resolution in the compute
            # dtype: the [B,Q,H,W] full-res tensor is the largest write of the
            # whole eval graph (~655 MB in f32 at b8@640 — measured 2.9 ms,
            # 36% of the forward); sigmoid probabilities lose only output
            # rounding under a bf16 linear interpolation, and every consumer
            # (semantic einsum, evaluators) upcasts to f32 anyway.
            if self.dtype is not None:
                masks = masks.astype(self.dtype)
            masks = jax.image.resize(
                masks, (b, q, images.shape[1], images.shape[2]), method="bilinear", antialias=False
            )
        return BisenetFormerOutput(masks=masks, logits=cls_probs, loss=None), aux
